package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.F

/** SURVEY.md §2.B — event/time processing in batch form. The streaming
  * twins (Structured Streaming with watermarks / state) live in
  * `graft.streaming` and are covered by ScalaTest; these batch versions
  * are the oracle-checked semantics.
  */
object EventQueries {

  val defs: Map[String, QueryDef] = Map(

    // q20: tumbling-window aggregation — hourly event rollup. In batch the
    // window key is just a truncated timestamp: one shuffle on
    // (hour, nothing else); at 100 TB the parquet scan prunes to the
    // 3 needed columns and aggregation is partial map-side.
    "q20_tumbling" -> QueryDef.of(
      """SELECT date_trunc('hour', ts) AS hour_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour_start"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(F.money(col("value"))).cast("double").as("total_value"))
    },

    // q21: sessionization with a 30-minute inactivity gap. Classic
    // lag -> flag -> running-sum session ids; both windows share one
    // shuffle on user_id. Gap compare in microseconds to match parquet
    // timestamp precision exactly on both engines.
    "q21_session" -> QueryDef.of(
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |), sess AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM flagged
        |)
        |SELECT user_id, session_idx, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  min(ts) AS start_ts, max(ts) AS end_ts
        |FROM sess GROUP BY user_id, session_idx
        |""".stripMargin) { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val micros = unix_micros(col("ts"))
      Tables.events(s, dir)
        .withColumn("new_sess",
          when(micros - lag(micros, 1).over(byUser) > 1800000000L, 1).otherwise(0))
        .withColumn("session_idx",
          sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts")).as("start_ts"),
          max(col("ts")).as("end_ts"))
    }
  )
}
