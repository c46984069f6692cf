package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft._
import graft.operators.Relational

/** Join-skew handling, measured (feeds SURVEY §5/§6): one fact key owns
  * 90% of the rows, the dim side is too big to broadcast — the exact shape
  * where a plain sort-merge join serializes on one straggler task.
  * Compares:
  *   - smj_skew_off: AQE skew-join disabled — the straggler baseline
  *   - smj_skew_on:  AQE splits the skewed partition at runtime (needs
  *     thresholds sized to the data; the 256 MB default ignores "small"
  *     100 MB stragglers that still dominate a stage)
  *   - salted: explicit salt-and-replicate (Relational.saltedJoin, q53's
  *     operator) — the static fallback that also covers the cases AQE
  *     skew-join can't touch (aggregation-feeding hash joins,
  *     pre-partitioned layouts, streaming)
  *   - agg_skew: groupBy on the same skewed key — demonstrating that
  *     ALGEBRAIC aggregates need no skew handling at all: map-side
  *     partial combine collapses every partition to ~#keys rows before
  *     the exchange.
  */
object ProfSkew {
  private def time(label: String)(df: => DataFrame): Long = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val ms = (System.nanoTime() - t0) / 1000000
    println(s"RESULT $label ms=$ms")
    ms
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val nFact = args.headOption.map(_.toLong).getOrElse(40000000L)
    val nKeys = 10000L

    // key 0 owns 90% of the fact; the rest spread uniformly — the
    // straggler partition must DOMINATE the stage for the measurement to
    // rise above sandbox noise (at 50/50 the parallel tail hides it)
    val fact = spark.range(nFact).select(
      when(col("id") % 10 < 9, 0L)
        .otherwise(pmod(hash(col("id")), lit(nKeys))).as("k"),
      (col("id") % 97).as("v")).cache()
    // dim: one row per key (enrichment shape — join output stays
    // fact-sized, so the MEASURED cost is the straggler, not fanout);
    // broadcast is force-disabled to model a dim that outgrows it
    val dim = spark.range(nKeys).select(
      col("id").as("dk"), (col("id") % 13).as("w")).cache()
    fact.count(); dim.count()

    // no aggregate after the join: a downstream hash requirement on k
    // would veto OptimizeSkewedJoin (it refuses to break the join's
    // output partitioning) — enrichment-sink is the shape skew-join fixes
    def smj = fact.join(dim, col("k") === col("dk"))
      .select(col("k"), col("v") + col("w"))

    def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
      val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    for (round <- 1 to 3) {
      println(s"--- round $round")
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.skewJoin.enabled" -> "false") {
        time("smj_skew_off")(smj)
      }
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        // size the trigger to the data: the 256 MB default never fires on
        // a 100 MB straggler that still dominates this stage
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m") {
        time("smj_skew_on")(smj)
      }
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        time("salted")(
          Relational.saltedJoin(fact, dim, "k", "dk", col("v"), saltFactor = 32)
            .select(col("k"), col("v") + col("w")))
      }
      // aggregation skew: no handling needed — partial combine collapses
      // each input partition to ~nKeys rows before the exchange
      time("agg_skew")(fact.groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv")))
    }

    // prove AQE actually split the straggler (final adaptive plan)
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m") {
      // the executed ADAPTIVE plan is only observable via a listener:
      // df.write and df.foreach each wrap their own QueryExecution, so
      // df.queryExecution stays un-finalized either way
      @volatile var captured = ""
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               durationNs: Long): Unit = {
          val str = qe.executedPlan.toString
          if (str.contains("SortMergeJoin")) captured = str
        }
        override def onFailure(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        smj.write.format("noop").mode("overwrite").save()
        // the listener fires on the async bus; poll for delivery
        val deadline = System.nanoTime() + 30L * 1000000000L
        while (captured.isEmpty && System.nanoTime() < deadline) Thread.sleep(100)
      } finally spark.listenerManager.unregister(listener)
      println("SKEW_MARK " + captured.linesIterator
        .find(l => l.toLowerCase.contains("skew"))
        .map(_.trim.take(160)).getOrElse("NOT FOUND"))
      println("FULL_PLAN_BEGIN\n" + captured + "\nFULL_PLAN_END")
    }
    spark.stop()
  }
}
