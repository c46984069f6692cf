package graft

import org.apache.spark.sql.functions._
import graft.operators.Kmv

/** KMV overlap estimation (q127 / operators.Kmv). */
class KmvSpec extends SpecBase {
  import spark.implicits._

  private def est(aN: Int, bFrom: Int, bTo: Int, k: Int) = {
    val a = (0 until aN).map(i => s"doc-$i").toDF("h")
    val b = (bFrom until bTo).map(i => s"doc-$i").toDF("h")
    Kmv.overlapEstimate(
      Kmv.sketch(a, $"h", k, "ka"), Kmv.sketch(b, $"h", k, "kb"), k)
      .head()
  }

  test("degenerate regime: union fits the sketch, all three estimates exact") {
    // |A|=300, |B|=300, overlap 100, union 500 <= k=1024
    val r = est(300, 200, 500, 1024)
    assert(r.getAs[Long]("union_est") == 500L)
    assert(r.getAs[Long]("inter_est") == 100L)
    assert(r.getAs[Long]("jaccard_1e6") == 200000L) // 100/500
  }

  test("estimate regime: within 15% of the exact join on a 20k-element union") {
    // |A|=12000, |B|=13000 (5000..18000), overlap 7000, union 18000 >> k=1024
    val r = est(12000, 5000, 18000, 1024)
    val u = r.getAs[Long]("union_est")
    val i = r.getAs[Long]("inter_est")
    assert(math.abs(u - 18000.0) / 18000.0 < 0.15, s"union_est=$u")
    assert(math.abs(i - 7000.0) / 7000.0 < 0.15, s"inter_est=$i")
  }

  test("estimator is deterministic (hash-keyed, no rand)") {
    val r1 = est(2000, 500, 2500, 256)
    val r2 = est(2000, 500, 2500, 256)
    assert(r1 == r2)
  }

  test("disjoint sets estimate ~zero intersection") {
    val r = est(5000, 10000, 15000, 512)
    assert(r.getAs[Long]("inter_est") <= 5000 / 50, s"inter_est=${r.getAs[Long]("inter_est")}")
  }

  test("q127 snapshot overlap tracks the exact distinct-content join at sf0.001") {
    val r = SparkEntry.queries("q127_corpus_overlap")(spark, SfDir).head()
    // exact twin of the query's snapshot derivation
    val base = Tables.documents(spark, SfDir)
      .select(col("doc_id"),
        md5(trim(regexp_replace(col("text"), "\\s+", " "))).as("h"),
        (graft.operators.Sampling.docHash32(concat(col("doc_id").cast("string"), lit(":v"))) % 10).as("slot"))
    val v1 = base.filter(col("slot") =!= 0).select(col("h")).distinct()
    val v2 = base.filter(col("slot") =!= 1)
      .select(when(col("slot") === 2, md5(concat(col("h"), lit(":edited")))).otherwise(col("h")).as("h"))
      .distinct()
    val exactInter = v1.intersect(v2).count()
    val exactUnion = v1.union(v2).distinct().count()
    val u = r.getAs[Long]("union_est")
    val i = r.getAs[Long]("inter_est")
    // sf0.001 union is only ~500 distinct contents: inside the k=1024
    // sketch, so the degenerate-exact regime applies
    assert(u == exactUnion, s"union_est=$u exact=$exactUnion")
    assert(i == exactInter, s"inter_est=$i exact=$exactInter")
  }
}
