package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft._
import graft.operators.Dedup

/** Passage-marking skew, measured (feeds SURVEY lesson 49): a boilerplate
  * passage planted in ~30% of documents — the real shape of web corpora,
  * where one cookie-banner / footer line repeats 1e8-1e9 times — makes the
  * window hash a mega-key. Compares the two encodings of
  * "mark every occurrence but the corpus-first":
  *   - window: row_number() over (partition by h) — the mega-key's WHOLE
  *     occurrence list sorts in one task; AQE skew handling rewrites joins
  *     and rebalance nodes only, so nothing splits it. Straggler shows as
  *     max-task >> p50-task.
  *   - agg_join (production Dedup.passageMarked): groupBy(h).agg(min
  *     (struct(id,pos))) + join back — partial min collapses the mega-key
  *     map-side (each input split emits ONE row for it), and the join-back
  *     probe is exactly what AQE skew-join splits.
  * The marked sets are identical (DedupSpec pins it); this harness records
  * the straggler-vs-balanced task profile at a scale where the skew
  * dominates.
  */
object ProfPassageSkew {

  /** max/sum/count of task durations while `body` runs — straggler metric. */
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
    val nDocs = args.headOption.map(_.toLong).getOrElse(20000000L)
    val k = 13

    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)
    def time(label: String)(df: => DataFrame): Unit = {
      stats.synchronized { stats.maxMs = 0; stats.sumMs = 0; stats.n = 0 }
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val ms = (System.nanoTime() - t0) / 1000000
      // listener bus is async; let the tail of task-end events drain
      Thread.sleep(500)
      println(s"RESULT $label wall_ms=$ms max_task_ms=${stats.maxMs} " +
        s"sum_task_ms=${stats.sumMs} tasks=${stats.n}")
    }

    // size AQE's skew trigger to the data, as a real deployment would
    // (the 256 MB default ignores stragglers that still dominate here)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")

    // SWEEP the boilerplate share: the window form's max task is the
    // mega-key's own sort, so it grows LINEARLY with the share (and with
    // corpus size — at web scale it is hours); the agg form's tasks are
    // share-INDEPENDENT (partial min collapses the mega-key map-side and
    // the hot branch keeps it out of every exchange). A share docs ARE
    // the same 13-token boilerplate line (whole-doc window — the
    // cookie-banner shape); the rest are unique 13-token docs, so every
    // doc contributes exactly one window and the mega-key share is the
    // only variable.
    val boiler = "subscribe to our newsletter for updates and follow our channels on social media"
    for (sharePct <- Seq(0L, 30L, 60L)) {
      val docs = spark.range(nDocs).select(
        col("id").as("doc_id"),
        when(pmod(col("id"), lit(100)) < sharePct, lit(boiler))
          .otherwise(format_string(
            (1 to 13).map(i => s"w%d_$i").mkString(" "),
            (1 to 13).map(_ => col("id")): _*))
          .as("text")).cache()
      docs.count()
      for (round <- 1 to 2) {
        println(s"--- share=$sharePct% round $round")
        time(s"window_s$sharePct")(Dedup.passageMarkedWindow(docs, "doc_id", "text", k))
        time(s"agg_join_s$sharePct")(Dedup.passageMarked(docs, "doc_id", "text", k))
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
