package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.StringType

import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.functions.expressions.{BottomKSample, FormatPhoneNumbers, FreqItemsSketch, MediaFeatureFold, MinHashSketch,
  NormalizeTaxonomyIds, PolyHash, QuantizeInt8Csv, Shingles, SimHashSketch,
  SortedMapBitIntersect, TaxonomyParents}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions with the SQL function registry so `spark.sql` users get
  * them too (`SELECT poly_hash(text) FROM docs`).
  *
  * Enable with:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)            // programmatic, or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * Also the whole-operator injection point: registers the
  * [[graft.plans.TopKPerKeyStrategy]] planner strategy so the custom
  * TopKPerKey logical node (partial-heap per-key top-k — see
  * graft.operators.TopK) plans in any session built with these
  * extensions, and the [[graft.plans.TopKPerKeyRewrite]] optimizer rule
  * so the `row_number() <= k` window idiom lowers onto that node
  * automatically (SQL and DataFrame users alike).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKPerKeyRewrite)
    ext.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => children match {
        // PolyHash consumes UTF8String — cast any SQL input (analysis-time
        // error on non-castable types instead of a codegen ClassCastException)
        case Seq(c) => PolyHash(Cast(c, StringType))
        case Seq(c, b, m) =>
          PolyHash(Cast(c, StringType),
            GraftExtensions.constLong(b, "poly_hash", "base"),
            GraftExtensions.constLong(m, "poly_hash", "mod"))
        case _ => throw new IllegalArgumentException(
          "poly_hash(str[, base, mod]) takes 1 or 3 arguments")
      }))

    ext.injectFunction((
      new FunctionIdentifier("nfkc_fold"),
      new ExpressionInfo(classOf[graft.functions.expressions.NfkcFold].getName, "nfkc_fold"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => graft.functions.expressions.NfkcFold(Cast(c, StringType))
        case _ => throw new IllegalArgumentException(
          "nfkc_fold(str) takes 1 argument")
      }))

    ext.injectFunction((
      new FunctionIdentifier("html_table_parse"),
      new ExpressionInfo(classOf[graft.functions.expressions.HtmlTableParse].getName,
        "html_table_parse"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => graft.functions.expressions.HtmlTableParse(Cast(c, StringType))
        case _ => throw new IllegalArgumentException(
          "html_table_parse(html) takes 1 argument")
      }))

    // Sketch aggregates + the sorted-map intersect, for spark.sql users.
    // Aggregate builders return the AggregateFunction; the analyzer wraps
    // it into an AggregateExpression during function resolution.
    ext.injectFunction((
      new FunctionIdentifier("minhash_sketch"),
      new ExpressionInfo(classOf[MinHashSketch].getName, "minhash_sketch"),
      (children: Seq[Expression]) => children match {
        case Seq(h, k) =>
          MinHashSketch(h, GraftExtensions.constInt(k, "minhash_sketch", "k"))
        case _ => throw new IllegalArgumentException(
          "minhash_sketch(hash_col, k) takes 2 arguments")
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_sketch"),
      new ExpressionInfo(classOf[SimHashSketch].getName, "simhash_sketch"),
      (children: Seq[Expression]) => children match {
        case Seq(h) => SimHashSketch(h)
        case _ => throw new IllegalArgumentException(
          "simhash_sketch(hash_col) takes 1 argument")
      }))
    ext.injectFunction((
      new FunctionIdentifier("freq_items_sketch"),
      new ExpressionInfo(classOf[FreqItemsSketch].getName, "freq_items_sketch"),
      (children: Seq[Expression]) => children match {
        case Seq(tok, cap, k) =>
          FreqItemsSketch(tok,
            GraftExtensions.constInt(cap, "freq_items_sketch", "capacity"),
            GraftExtensions.constInt(k, "freq_items_sketch", "k"))
        case _ => throw new IllegalArgumentException(
          "freq_items_sketch(tok_col, capacity, k) takes 3 arguments")
      }))
    ext.injectFunction((
      new FunctionIdentifier("bottom_k_sample"),
      new ExpressionInfo(classOf[BottomKSample].getName, "bottom_k_sample"),
      (children: Seq[Expression]) => children match {
        case Seq(h, id, k) =>
          BottomKSample(h, id, GraftExtensions.constInt(k, "bottom_k_sample", "k"))
        case _ => throw new IllegalArgumentException(
          "bottom_k_sample(hash_col, id_col, k) takes 3 arguments")
      }))
    ext.injectFunction((
      new FunctionIdentifier("sorted_map_bit_intersect"),
      new ExpressionInfo(classOf[SortedMapBitIntersect].getName, "sorted_map_bit_intersect"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => SortedMapBitIntersect(a, b)
        case _ => throw new IllegalArgumentException(
          "sorted_map_bit_intersect(a, b) takes 2 arguments")
      }))

    // Round-3 natives: the single-pass string/array kernels.
    ext.injectFunction((
      new FunctionIdentifier("normalize_taxonomy_ids"),
      new ExpressionInfo(classOf[NormalizeTaxonomyIds].getName, "normalize_taxonomy_ids"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => NormalizeTaxonomyIds(c)
        case _ => throw new IllegalArgumentException(
          "normalize_taxonomy_ids(string_array) takes 1 argument")
      }))
    ext.injectFunction((
      new FunctionIdentifier("taxonomy_parents"),
      new ExpressionInfo(classOf[TaxonomyParents].getName, "taxonomy_parents"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => TaxonomyParents(c)
        case _ => throw new IllegalArgumentException(
          "taxonomy_parents(string_array) takes 1 argument")
      }))
    ext.injectFunction((
      new FunctionIdentifier("format_phone_numbers"),
      new ExpressionInfo(classOf[FormatPhoneNumbers].getName, "format_phone_numbers"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => FormatPhoneNumbers(Cast(c, StringType))
        case _ => throw new IllegalArgumentException(
          "format_phone_numbers(str) takes 1 argument")
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "shingles"),
      (children: Seq[Expression]) => children match {
        case Seq(c, w) =>
          if (!w.foldable) throw new IllegalArgumentException(
            "shingles: w must be a literal")
          Shingles(c, GraftExtensions.constInt(w, "shingles", "w"))
        case _ => throw new IllegalArgumentException(
          "shingles(token_array, w) takes 2 arguments")
      }))
    ext.injectFunction((
      new FunctionIdentifier("quantize_int8_csv"),
      new ExpressionInfo(classOf[QuantizeInt8Csv].getName, "quantize_int8_csv"),
      (children: Seq[Expression]) => children match {
        // consumes array<float>; cast fails at analysis on non-castable types
        case Seq(c) => QuantizeInt8Csv(Cast(c, ArrayType(FloatType)))
        case _ => throw new IllegalArgumentException(
          "quantize_int8_csv(float_array) takes 1 argument")
      }))
    ext.injectFunction((
      new FunctionIdentifier("media_feature_fold"),
      new ExpressionInfo(classOf[MediaFeatureFold].getName, "media_feature_fold"),
      (children: Seq[Expression]) => children match {
        case Seq(c, d) =>
          if (!d.foldable) throw new IllegalArgumentException(
            "media_feature_fold: dim must be a literal")
          MediaFeatureFold(c, GraftExtensions.constInt(d, "media_feature_fold", "dim"))
        case _ => throw new IllegalArgumentException(
          "media_feature_fold(binary, dim) takes 2 arguments")
      }))
  }
}

object GraftExtensions {
  /** Shared literal-argument gate for the SQL builders: a clear
    * "must be a numeric literal" message instead of a raw
    * ClassCastException reaching the SQL user. */
  private[graft] def constLong(e: Expression, fn: String, name: String): Long = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: $name must be a literal, got ${e.sql}")
    e.eval() match {
      case n: Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $name must be numeric, got $other")
    }
  }
  private[graft] def constInt(e: Expression, fn: String, name: String): Int = {
    val v = constLong(e, fn, name)
    // .toInt would silently wrap a too-large literal into a nonsense
    // (possibly negative) value — report it like the non-numeric case.
    if (v < Int.MinValue || v > Int.MaxValue) throw new IllegalArgumentException(
      s"$fn: $name must fit in a 32-bit int, got $v")
    v.toInt
  }
}
