package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Sessionization encodings compared on real event data: the q21
  * window encoding (lag + running sum — two window passes over every
  * event) vs Spark's built-in `session_window` aggregate (gap-merged
  * session assignment inside ONE aggregation, no window function).
  * Both shuffle once on user_id; the question is the post-shuffle work.
  * Run: `sbt "runMain graft.tools.ProfSession [sfDir]"`. */
object ProfSession {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(Some("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val ev = Tables.events(spark, dir).localCheckpoint(true)

    def windowForm = // the exact q21 kernel (shared helper — measured as shipped)
      graft.queries.EventQueries.sessionized(ev)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
    def sessionWindowForm =
      ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
        .drop("w")

    def run(tag: String, f: => org.apache.spark.sql.DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime
      f.write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime - t0) / 1e9}%.3f s")
    }
    // semantic check first: same (user, start, end, n) session partition?
    val a = windowForm.select("user_id", "start_ts", "end_ts", "n_events")
      .collect().map(_.toSeq).toSet
    val b = sessionWindowForm.select("user_id", "start_ts", "end_ts", "n_events")
      .collect().map(_.toSeq).toSet
    println(s"sessions equal: ${a == b} (window=${a.size}, session_window=${b.size}, " +
      s"only-window=${(a -- b).take(2)}, only-sw=${(b -- a).take(2)})")
    run("window_form ", windowForm)
    run("session_wdw ", sessionWindowForm)
    run("window_form ", windowForm)
    run("session_wdw ", sessionWindowForm)
    spark.stop()
  }
}
