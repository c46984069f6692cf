package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft._
import graft.operators.Profile

/** Measures q104's profiler encodings on a wide synthetic table
  * (SURVEY §6 lesson 34; all sinks are noop WRITES — counting a
  * no-group aggregate's single row lets Catalyst prune the aggregates
  * and "measure" 97 ms):
  *   - expand_mixed: ONE aggregate carrying count/min/max AND the N
  *     count(DISTINCT col) — the mixed rewrite turns into a
  *     SortAggregate over the Expand-replicated stream (string min/max
  *     buffers are not hash-aggregable): 43-45 s. The disaster leg.
  *   - distinct_expand: N count(DISTINCT) ALONE — hash-aggregable, the
  *     partial distinct collapses Expand output pre-exchange: 3.7-4.3 s.
  *   - unpivot_exact: what Profile.profile ships (stats pass + stacked
  *     distinct pass): ~6 s standalone, and the two passes share one
  *     exchange under repartitionTo (ReuseExchange).
  *   - approx_onepass: Profile.profileApprox — HLL NDV rides the stats
  *     row, no Expand at all: 3.6-4.6 s, the 100 TB default.
  */
object ProfProfile {
  private def time(label: String)(df: => DataFrame): Long = {
    // noop WRITE, not count(): counting a no-group aggregate's single
    // output row lets Catalyst prune the aggregate expressions
    // themselves (first harness cut measured the expand leg at 97 ms —
    // it wasn't running the distincts at all)
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val ms = (System.nanoTime() - t0) / 1000000
    println(s"RESULT $label ms=$ms")
    ms
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)

    // 8 columns with distinct-cardinalities from 16 to ~n/2
    val cols = (0 until 8).map(i => s"c$i")
    val df = spark.range(n).select(
      (0 until 8).map(i =>
        ((col("id") * 2654435761L) % math.max(16L, n >> (14 - i))).cast("string")
          .as(s"c$i")): _*)
      .cache()
    df.count()

    // the round-6 first-cut encoding, kept for the measured comparison
    def unpivotProfile: DataFrame = {
      val unpivotArgs = cols.flatMap { c => Seq(lit(c), col(c).cast("string")) }
      val passB = df.select(stack((Seq(lit(cols.size)) ++ unpivotArgs): _*)
          .as(Seq("col_name", "v")))
        .groupBy(col("col_name"))
        .agg(count_distinct(col("v")).as("n_distinct"))
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)).as(s"${c}__n"), min(col(c)).cast("string").as(s"${c}__min"),
          max(col(c)).cast("string").as(s"${c}__max"))
      }
      val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
      val stackArgs = cols.flatMap { c =>
        Seq(lit(c), col(s"${c}__n"), col(s"${c}__min"), col(s"${c}__max"))
      }
      one.select(col("__rows"), stack((Seq(lit(cols.size)) ++ stackArgs): _*)
          .as(Seq("col_name", "n_vals", "min_s", "max_s")))
        .join(broadcast(passB), Seq("col_name"))
    }

    for (round <- 1 to 3) {
      println(s"--- round $round (n=$n) ---")
      time("expand_mixed") {
        df.agg(count(lit(1)),
          (cols.map(c => count_distinct(col(c)).as(s"${c}_d")) ++
            cols.map(c => min(col(c)).cast("string").as(s"${c}_min")) ++
            cols.map(c => max(col(c)).cast("string").as(s"${c}_max"))): _*)
      }
      time("distinct_expand") {
        df.agg(count(lit(1)),
          cols.map(c => count_distinct(col(c)).as(s"${c}_d")): _*)
      }
      time("unpivot_shipped") {
        Profile.profile(df, cols)
      }
      time("unpivot_exact") {
        unpivotProfile
      }
      time("approx_onepass") {
        Profile.profileApprox(df, cols)
      }
    }
    spark.stop()
  }
}
