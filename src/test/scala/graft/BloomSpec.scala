package graft

import org.apache.spark.sql.functions._
import graft.operators.Bloom

/** Bloom-filter semi-join pruning (q125 / operators.Bloom). */
class BloomSpec extends SpecBase {
  import spark.implicits._

  private lazy val members = (0 until 2000).map(i => s"member-$i").toDF("s")
  private lazy val bloom = Bloom.build(members, $"s", expectedItems = 2000)

  test("no false negatives: every inserted element passes might_contain") {
    val misses = members.filter(!Bloom.mightContain(bloom, $"s")).count()
    assert(misses == 0L)
  }

  test("false-positive rate on non-members stays near the design fpp") {
    val nonMembers = (0 until 10000).map(i => s"other-$i").toDF("s")
    val fp = nonMembers.filter(Bloom.mightContain(bloom, $"s")).count()
    // design fpp 1%; allow generous slack for hash variance on 10k probes
    assert(fp <= 500, s"false-positive count $fp out of 10000 probes")
  }

  test("undershot estimate degrades fpp, never recall") {
    val tiny = Bloom.build(members, $"s", expectedItems = 16) // 125x undershoot
    assert(members.filter(!Bloom.mightContain(tiny, $"s")).count() == 0L)
  }

  test("q125 bloom-pruned decontamination equals the broadcast-exact q75") {
    def rows(name: String) =
      SparkEntry.queries(name)(spark, SfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = rows("q75_decontaminate")
    val pruned = rows("q125_bloom_decontaminate")
    assert(exact.nonEmpty)
    assert(pruned == exact)
  }

  test("q125 plan: scan-side might_contain filter, shuffle-hash pair join, no broadcast join") {
    val df = SparkEntry.queries("q125_bloom_decontaminate")(spark, SfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom probe missing from the physical plan")
    assert(plan.contains("ShuffledHashJoin"), "pair join must be shuffle-hash (nothing broadcastable at scale)")
    assert(!plan.contains("BroadcastHashJoin"), "q125 must not rely on a broadcast of the filter side")
  }
}
