package graft

import org.apache.spark.sql.functions._
import graft.functions.F
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SpecBase {
  import spark.implicits._

  test("fingerprint matches the polynomial definition exactly") {
    // "ab" -> ((0*31+97)*31+98) % 1e9+7 = 3105
    val out = Seq((1L, "ab")).toDF("id", "text")
      .select(TextAnalysis.fingerprint($"text")).head().getLong(0)
    assert(out == 97L * 31 + 98)
  }

  test("native PolyHash expression agrees with the HOF reference on real docs") {
    val docs = Tables.documents(spark, SfDir)
    val mismatches = docs.select(
      TextAnalysis.fingerprint($"text").as("native"),
      TextAnalysis.fingerprintHof($"text").as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(mismatches == 0)
  }

  test("fingerprint normalizes whitespace and case first") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world")).toDF("id", "text")
    val fps = df.select(TextAnalysis.fingerprint($"text")).collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
  }

  test("stopwordRatio counts occurrences, not distinct hits") {
    val r = Seq((1L, "the the cat")).toDF("id", "text")
      .select(TextAnalysis.stopwordRatio(F.tokens($"text"))).head().getDouble(0)
    assert(math.abs(r - 2.0 / 3.0) < 1e-12)
  }

  test("bpeTokenCount splits letter runs, digit runs, and symbols") {
    val n = Seq((1L, "ab 12 cd!")).toDF("id", "text")
      .select(TextAnalysis.bpeTokenCount($"text")).head().getLong(0)
    assert(n == 4) // ab, 12, cd, !
  }

  test("minShingleFingerprint is stable and order-sensitive") {
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"), (3L, "j i h g f e d c b a")).toDF("id", "text")
    val fps = df.orderBy("id").select(TextAnalysis.minShingleFingerprint(F.tokens($"text"))).collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("minShingleFingerprints (map-only) matches the explode+min aggregate form; null text -> null fp") {
    import org.apache.spark.sql.functions.{col, explode_outer, min, xxhash64}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
      .select(col("doc_id"), col("text"))
      .union(Seq((-1L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val scalarForm = TextAnalysis.minShingleFingerprints(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val aggForm = docs
      .select(col("doc_id").as("id"), F.tokens(col("text")).as("toks"))
      .select(col("id"), explode_outer(graft.operators.Dedup.shingles(col("toks"), 8)).as("sh"))
      .groupBy(col("id")).agg(min(xxhash64(col("sh"))).as("fp"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // identical on every real document; on NULL text the scalar form gives
    // NULL (no content -> no fingerprint) where the aggregate form's
    // xxhash64(null) accidentally yielded its seed 42 — a deliberate,
    // pinned divergence (hash functions are never-null in Spark)
    assert(scalarForm - (-1L) == aggForm - (-1L))
    assert(scalarForm(-1L).isEmpty && aggForm(-1L).contains(42L))
    val plan = TextAnalysis.minShingleFingerprints(docs, "doc_id", "text", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("aggregate"), plan.take(600))
  }

  test("langIdPrediction thresholds on ratio") {
    val df = Seq((1L, "the of and cat"), (2L, "cat dog fish bird")).toDF("id", "text")
    val out = df.orderBy("id")
      .select(TextAnalysis.langIdPrediction(TextAnalysis.stopwordRatio(F.tokens($"text")))).collect()
    assert(out(0).getString(0) == "en" && out(1).getString(0) == "unknown")
  }

  test("bm25TopK: tf saturation, idf rarity, and length normalization order as BM25 demands") {
    // equal-length docs so only tf/idf vary across d1-d3; d4 repeats d1's
    // content at 3x length for the normalization check. 'rare' appears in
    // d2 only; 'com' in every doc.
    val docs = Seq(
      (1L, "com aaa bbb ccc"),
      (2L, "com rare ddd eee"),
      (3L, "com com fff ggg"),
      (4L, "com aaa bbb ccc com aaa bbb ccc com aaa bbb ccc")).toDF("doc_id", "text")
    val qs = Seq(("q_rare", "rare"), ("q_com", "com")).toDF("query_id", "tok")
    val r = TextAnalysis.bm25TopK(docs, "doc_id", "text", qs, topK = 10)
      .collect()
      .map(x => (x.getAs[String]("query_id"), x.getAs[Long]("doc_id")) ->
        (x.getAs[Long]("score_1e4"), x.getAs[Long]("rk"))).toMap
    // rare term: only d2 retrieved, and beats d2's own score for the
    // everywhere-term (idf dominance at equal tf and length)
    assert(r.keySet.count(_._1 == "q_rare") == 1)
    assert(r(("q_rare", 2L))._2 == 1L)
    assert(r(("q_rare", 2L))._1 > r(("q_com", 2L))._1)
    // common term: d3 (tf=2) outranks d1/d2 (tf=1) at equal length;
    // d4 carries tf=3 but 3x the length — normalization must hold its
    // score below d3's saturated-tf score
    assert(r(("q_com", 3L))._1 > r(("q_com", 1L))._1)
    assert(r(("q_com", 1L))._1 == r(("q_com", 2L))._1)
    assert(r(("q_com", 3L))._1 > r(("q_com", 4L))._1)
    // ranks are the (score desc, doc_id) total order, 1..hits
    val comRanks = r.filterKeys(_._1 == "q_com").values.map(_._2).toSeq.sorted
    assert(comRanks == Seq(1L, 2L, 3L, 4L))
  }
}
