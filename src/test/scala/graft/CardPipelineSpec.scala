package graft

import org.apache.spark.sql.functions._
import graft.pipelines.CardPipeline

class CardPipelineSpec extends SpecBase {
  import spark.implicits._

  test("entry produces a non-empty card table with unique card ids") {
    val cards = SparkEntry.entry(spark).cache()
    val n = cards.count()
    assert(n > 0)
    assert(cards.select($"card_id").distinct().count() == n)
    assert(cards.columns.contains("card_score"))
  }

  test("branch merge keeps one row per content key with org branch counts") {
    val branches = CardPipeline.flatBranches(spark, SfDir).cache()
    val n = branches.count()
    assert(branches.select($"branch_key").distinct().count() == n)
    // counts are consistent: per-org row count equals the annotated count
    val bad = branches.groupBy($"organization_id", $"organization_branch_count")
      .agg(count(lit(1)).as("actual"))
      .filter($"actual" =!= $"organization_branch_count").count()
    assert(bad == 0)
  }

  test("card scores follow the multiplicative tiers") {
    val cards = SparkEntry.entry(spark)
    val bad = cards.filter($"card_score" <= 0).count()
    assert(bad == 0)
    val urgent = cards.filter($"branch_id".isNotNull && $"card_score" === 0.0).count()
    assert(urgent == 0)
  }
}
