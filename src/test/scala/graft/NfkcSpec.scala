package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.NfkcFold

/** Pins nfkc_fold against hand-written expected outputs from the public
  * Unicode NFKC tables (NOT against Normalizer itself — that would test
  * the implementation with the implementation). */
class NfkcSpec extends SpecBase {
  import spark.implicits._

  private def fold1(s: String): String =
    Seq(Tuple1(s)).toDF("t").select(NfkcFold(col("t")).as("f")).head().getString(0)

  test("NFKC compatibility forms collapse and case folds") {
    // fullwidth letters + ideographic space
    assert(fold1("Ｃａｆｅ　Ｘ") == "cafe x")
    // ligatures
    assert(fold1("ﬁn ﬃn") == "fin ffin")
    // circled digit and vulgar fraction (U+2044 FRACTION SLASH in the
    // NFKC expansion of ½ — not ASCII '/')
    assert(fold1("①") == "1")
    assert(fold1("½") == "1⁄2")
    // combining sequence composes to the precomposed form
    assert(fold1("éclair") == "éclair")
    // no-break space is compatibility-mapped to a plain space
    assert(fold1("a b") == "a b")
    // plain uppercase folds
    assert(fold1("STRASSE") == "strasse")
  }

  test("documented approximation edges: ß and dotted capital I") {
    // String.toLowerCase does NOT apply the full case-fold ß→ss (that is
    // the UPPERCASE direction in Java); nfkc_fold leaves ß in place —
    // documented in the expression's scaladoc, pinned here so a future
    // "fix" is a conscious semantic change.
    assert(fold1("straße") == "straße")
    // İ (U+0130) lowercases to i + combining dot above; no precomposed
    // form exists, so the closing NFKC keeps the two-codepoint sequence.
    assert(fold1("İstanbul") == "i̇stanbul")
  }

  test("nfkc_fold is null-safe and resolves through the SQL registry") {
    val r = spark.sql("SELECT nfkc_fold('Ｆﬁ') AS a, nfkc_fold(CAST(NULL AS STRING)) AS b").head()
    assert(r.getString(0) == "ffi" && r.isNullAt(1))
    // non-string input casts at analysis (the shared builder posture)
    assert(spark.sql("SELECT nfkc_fold(12) AS n").head().getString(0) == "12")
  }

  test("q148 collapses all six spelling variants per base key") {
    val out = SparkEntry.queries("q148_nfkc_dedup")(spark, SfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every group's key is fully folded (no uppercase, no ligature, no
    // fullwidth survivors)
    rows.foreach { r =>
      val key = r.getString(0)
      assert(key == NfkcFold.fold(key), s"key not a fixed point: $key")
      assert(!key.exists(c => c.isUpper || c > 0x7f), s"unfolded residue in: $key")
    }
    // with 150+ customers over 50 bases and 6 variants, at least one
    // group must have collapsed ≥2 distinct raw forms
    assert(rows.exists(_.getAs[Long]("n_forms") >= 2), "no multi-form group; weak fixture")
  }
}
