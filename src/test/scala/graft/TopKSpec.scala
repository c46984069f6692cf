package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TopK

/** The custom TopKPerKey plan node (logical + strategy + exec): semantic
  * equality with the window encoding, the two-phase physical shape, and
  * the map-side trim that is the operator's reason to exist.
  */
class TopKSpec extends SpecBase {
  import spark.implicits._

  private def scored = Tables.documents(spark, SfDir)
    .select($"doc_id", $"lang",
      graft.operators.TextAnalysis.qualityScore(graft.functions.F.tokens($"text")).as("quality"))

  test("topKPerKey equals the row_number window encoding") {
    for (k <- Seq(1, 3, 10)) {
      val custom = TopK.topKPerKey(scored,
        keys = Seq($"lang"), order = Seq($"quality".desc, $"doc_id"), k = k)
        .select($"lang", $"doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val w = Window.partitionBy($"lang").orderBy($"quality".desc, $"doc_id")
      val window = scored.withColumn("rn", row_number().over(w)).filter($"rn" <= k)
        .select($"lang", $"doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(custom == window,
        s"k=$k: custom-only ${(custom -- window).take(3)}, window-only ${(window -- custom).take(3)}")
    }
  }

  test("plans as partial + exchange + final, with no sort") {
    // the exec node prints as "TopKPerKey [keys], [order], k, partial"
    val p = TopK.topKPerKey(scored, Seq($"lang"), Seq($"quality".desc, $"doc_id"), 3)
      .queryExecution.executedPlan.toString
    val nodes = p.linesIterator.filter(_.contains("TopKPerKey ")).toSeq
    assert(nodes.size == 2, s"expected partial+final TopKPerKey, got:\n${p.take(700)}")
    assert(nodes.exists(_.contains(", true")) && nodes.exists(_.contains(", false")),
      s"need one partial and one final phase:\n${nodes.mkString("\n")}")
    assert(p.contains("Exchange hashpartitioning"), "final phase must cluster by key")
    assert(!p.contains("Sort "), s"bounded heaps must replace sorting:\n${p.take(700)}")
  }

  test("map-side partial trims the exchange to <= k rows per key per partition") {
    // 4 input partitions x 1 key x k=2 -> at most 8 rows ever reach the
    // exchange, regardless of the 10k input rows. Read the partial
    // node's own numOutputRows metric (AQE off so the plain plan tree is
    // walkable).
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val oneKey = spark.range(0, 10000, 1, 4)
        .select(lit("k").as("key"), $"id")
      val out = TopK.topKPerKey(oneKey, Seq($"key"), Seq($"id"), 2)
      assert(out.collect().map(_.getLong(1)).sorted.toSeq == Seq(0L, 1L))
      val partial = out.queryExecution.executedPlan.collect {
        case t: graft.plans.TopKPerKeyExec if t.partial => t
      }
      assert(partial.size == 1, "partial phase missing from executed plan")
      val shuffled = partial.head.metrics("numOutputRows").value
      assert(shuffled > 0 && shuffled <= 8,
        s"partial trim failed: $shuffled rows reached the exchange (expected <= 8)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("partial key cap degrades to pass-through, never to wrong results") {
    // 100 keys per partition against a cap of 2: almost every row
    // bypasses the map-side trim, but the final phase still produces
    // exactly the window-encoding answer. AQE off to walk the plan tree.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.range(0, 10000, 1, 4)
        .select(($"id" % 100).as("key"), $"id")
      val out = TopK.topKPerKey(df, Seq($"key"), Seq($"id"), 2, maxPartialKeys = 2)
      val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = (0L until 100L).flatMap(k => Seq((k, k), (k, k + 100L))).toSet
      assert(got == expect,
        s"missing ${(expect -- got).take(3)}, extra ${(got -- expect).take(3)}")
      val partial = out.queryExecution.executedPlan.collect {
        case t: graft.plans.TopKPerKeyExec if t.partial => t
      }.head
      assert(partial.metrics("numBypassedRows").value > 0,
        "cap of 2 against 100 keys must have bypassed rows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("final phase stays exact when one post-shuffle partition holds all the keys") {
    // Adversarial key distribution for the FINAL phase: with one shuffle
    // partition, a single task's heap map must hold every distinct key
    // (100k here — the output-sized regime the partial cap can't help
    // with, since the final phase must be exact). Results must match the
    // per-key minimum exactly and the run must complete in bounded
    // memory: the map holds k rows per key — output-sized, the same
    // posture as a hash aggregate's final phase on the same data.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val nKeys = 100000L
      val df = spark.range(0, 3 * nKeys, 1, 8)
        .select(($"id" % nKeys).as("key"), $"id".as("v"))
      val got = TopK.topKPerKey(df, Seq($"key"), Seq($"v"), 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got.size == nKeys, s"expected $nKeys keys, got ${got.size}")
      // top-1 under ascending v is the key itself (v = key + i*nKeys)
      val bad = got.iterator.filter { case (k, v) => v != k }.take(3).toSeq
      assert(bad.isEmpty, s"wrong minima: $bad")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  test("topKWithRank ranks match the window encoding and add no third exchange") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"quality".desc, $"doc_id")
    val expected = scored.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
      .select($"lang", $"doc_id", $"rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val ranked = TopK.topKWithRank(scored, $"lang", Seq($"quality".desc, $"doc_id"), 3, "rk")
    val got = ranked.select($"lang", $"doc_id", $"rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected,
      s"rank mismatch: got-only ${(got -- expected).take(3)}, want-only ${(expected -- got).take(3)}")
    val p = ranked.queryExecution.executedPlan.toString
    val shuffles = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Broadcast"))
    assert(shuffles == 1, s"rank window must reuse the final phase's clustering, got $shuffles exchanges")
  }

  test("ties beyond k are cut deterministically by the order's tiebreaker") {
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 5.0), ("b", 4L, 1.0))
      .toDF("key", "id", "score")
    val kept = TopK.topKPerKey(df, Seq($"key"), Seq($"score".desc, $"id"), 2)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L), s"got $kept")
  }
}
