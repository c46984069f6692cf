package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.F

/** Structured Streaming twins of the batch event queries (SURVEY.md §2.B).
  *
  * The same transforms run over `readStream` sources: watermarked
  * event-time windows for the rollup, built-in `session_window` for
  * gap-based sessions, and `flatMapGroupsWithState` for the custom-state
  * variant. Batch q20/q21 are the oracle-checked semantics; these are
  * their incremental forms (verified against the batch results in
  * `StreamingSpec`).
  */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class SessionSummary(user_id: Long, session_idx: Long, n_events: Long,
                            start_ts: Timestamp, end_ts: Timestamp)
  case class OpenSession(idx: Long, n: Long, start: Long, end: Long)

  /** Hourly tumbling rollup. Streaming-legal aggregates only: exact
    * count-distinct isn't incremental, so user counts use HLL
    * (`approx_count_distinct`) — the standard scale trade-off; batch q20
    * keeps the exact count. Watermark bounds state to 2h of windows. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id")).as("n_users_approx"),
        sum(F.money(col("value"))).cast("double").as("total_value"))
      .select(col("window.start").as("hour_start"), col("n_events"),
        col("n_users_approx"), col("total_value"))

  /** Gap-based sessions via the built-in session_window (30-minute gap).
    * State is per (user, open window) and bounded by the watermark. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("start_ts"),
        col("session_window.end").as("end_ts"), col("n_events"))

  /** Custom-state sessionization with flatMapGroupsWithState — the shape
    * for session logic the built-in window can't express (per-session
    * ordinals, custom emission rules). Emits closed sessions when the
    * event-time watermark passes the 30-minute gap.
    *
    * Works identically in batch mode (single group pass), which is how the
    * spec cross-checks it against oracle-verified q21.
    */
  /** foreachBatch upsert sink: maintains a keyed parquet table where each
    * micro-batch's rows overwrite existing rows with the same key — the
    * streaming twin of the q36 upsert semantics (update_table.py), and the
    * standard pattern for keeping a serving table current from a stream.
    *
    * Merge = union + keep-first with batch rows ranked above existing
    * (one window pass); the new snapshot is staged and swapped in via
    * directory rename so readers never see a half-written table.
    */
  def parquetUpsertSink(keyCol: String, outDir: String)(batch: DataFrame, batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions.{col, lit}
    val spark = batch.sparkSession
    val current = Paths.get(outDir, "current")
    val staged = Paths.get(outDir, s"staging_$batchId")
    val incoming = batch.withColumn("__src", lit(1))
    val merged =
      if (Files.exists(current)) {
        val existing = spark.read.parquet(current.toString).withColumn("__src", lit(0))
        graft.operators.Relational.dedupKeepFirst(
          existing.unionByName(incoming),
          keys = Seq(col(keyCol)),
          order = Seq(col("__src").desc))
      } else incoming
    merged.drop("__src").write.mode("overwrite").parquet(staged.toString)
    // swap: retire the old snapshot, promote the staged one
    if (Files.exists(current)) {
      val retired = Paths.get(outDir, s"retired_$batchId")
      Files.move(current, retired)
      Files.move(staged, current)
      org.apache.commons.io.FileUtils.deleteDirectory(retired.toFile)
    } else Files.move(staged, current)
  }

  /** Timestamp <-> microseconds, preserving full parquet precision
    * (java.sql.Timestamp.getTime alone floors to milliseconds). */
  private def toMicros(ts: Timestamp): Long =
    (ts.getTime / 1000) * 1000000L + ts.getNanos / 1000
  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  def sessionizeWithState(spark: SparkSession, events: Dataset[Event]): Dataset[SessionSummary] = {
    import spark.implicits._
    val gapUs = 30L * 60 * 1000000L

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[OpenSession], SessionSummary](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[List[OpenSession]]) =>
          // Sort this micro-batch's events; merge into the open session.
          val sorted = rows.toSeq.sortBy(e => (toMicros(e.ts), e.event_id))
          var sessions = state.getOption.getOrElse(Nil)
          var closed = List.empty[SessionSummary]
          for (e <- sorted) {
            val t = toMicros(e.ts)
            sessions match {
              case open :: rest if t - open.end <= gapUs =>
                sessions = open.copy(n = open.n + 1, end = t) :: rest
              case open :: rest =>
                closed ::= SessionSummary(userId, open.idx, open.n,
                  fromMicros(open.start), fromMicros(open.end))
                sessions = OpenSession(open.idx + 1, 1, t, t) :: rest
              case Nil =>
                sessions = OpenSession(0, 1, t, t) :: Nil
            }
          }
          state.update(sessions)
          // In batch mode (and at end-of-stream) emit the still-open session.
          val openEmit = sessions.map(open =>
            SessionSummary(userId, open.idx, open.n, fromMicros(open.start), fromMicros(open.end)))
          (closed.reverse ++ openEmit).iterator
      }
  }
}
