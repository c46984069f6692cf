package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft._
import graft.operators.PrefixSum

/** Sequence-packing straggler profile (feeds SURVEY lesson 50): the
  * running-sum stage of q70/q88 over a corpus that is 90% ONE language —
  * the real shape of a web-scale pretraining mix, where `en` dominates.
  * Compares the two encodings of `SUM(tokens) OVER (PARTITION BY lang
  * ORDER BY doc_id)`:
  *   - window: the dominant language's WHOLE corpus sorts in one window
  *     task; AQE skew handling rewrites joins and rebalance nodes only,
  *     so nothing splits it — the straggler shows as max-task >> mean.
  *   - prefix_sum (production PrefixSum.runningSum): rows shuffle once
  *     on (lang, doc_id div 65536); per-bucket totals ride the reused
  *     exchange; broadcast base offsets add map-side. Max task is
  *     bounded by the bucket width regardless of the language mix.
  * The outputs are identical (PrefixSumSpec pins row-for-row equality);
  * this harness records the straggler curve the plans imply.
  */
object ProfPack {

  private final class TaskStats extends SparkListener {
    @volatile var maxMs = 0L
    @volatile var sumMs = 0L
    @volatile var n = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      val ms = t.taskInfo.duration
      if (ms > maxMs) maxMs = ms
      sumMs += ms; n += 1
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val nDocs = args.headOption.map(_.toLong).getOrElse(50000000L)

    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)
    def time(label: String)(df: => DataFrame): Unit = {
      stats.synchronized { stats.maxMs = 0; stats.sumMs = 0; stats.n = 0 }
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val ms = (System.nanoTime() - t0) / 1000000
      Thread.sleep(500) // listener bus is async
      println(s"RESULT $label wall_ms=$ms max_task_ms=${stats.maxMs} " +
        s"sum_task_ms=${stats.sumMs} tasks=${stats.n} " +
        s"straggler_share=${"%.2f".format(stats.maxMs.toDouble / math.max(1, stats.sumMs))}")
    }

    // dominant-language share swept 50→99%: the window's straggler is
    // the dominant language's own sort, so its max task grows linearly
    // with the share while the prefix sum's stays bucket-width-bounded.
    // Token counts pre-derived (the profile isolates the cumsum stage,
    // not tokenization).
    val shares = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(50, 90, 99)
    for (share <- shares) {
      val docs = spark.range(nDocs)
        .select($"id".as("doc_id"),
          when(pmod($"id", lit(100)) < share, "en")
            .otherwise(concat(lit("l"), pmod($"id", lit(10)))).as("lang"),
          (pmod($"id" * 2654435761L, lit(900)) + 100).as("tokens"))
      val w = Window.partitionBy($"lang").orderBy($"doc_id")
      time(s"window_share$share")(docs.withColumn("cum", sum($"tokens").over(w)))
      time(s"prefix_sum_share$share")(PrefixSum.runningSum(docs, Seq("lang"),
        expr("doc_id div 65536"), Seq($"doc_id"), $"tokens", "cum"))
    }

    spark.stop()
  }
}
