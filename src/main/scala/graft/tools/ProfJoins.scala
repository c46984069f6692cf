package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft._

/** Measures the new join operators against their naive encodings on the
  * sf0.1 events table (100k rows): as-of carry-forward vs the
  * pair-expanding join+rank, and the binned range join vs the raw
  * inequality join (BroadcastNestedLoopJoin). Numbers feed SURVEY §6.
  */
object ProfJoins {
  private def time(label: String)(df: => DataFrame): Long = {
    val t0 = System.nanoTime()
    val n = df.count()
    val ms = (System.nanoTime() - t0) / 1000000
    println(s"RESULT $label rows=$n ms=$ms")
    ms
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    // the join+rank branch IS the naive baseline — keep the optimizer
    // rule from lowering its rn=1 window onto the TopKPerKey node
    spark.conf.set(graft.plans.TopKPerKeyRewrite.EnabledKey, "false")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ev = Tables.events(spark, dir).cache()
    ev.count()

    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))

    val idx = operators.AsOf.asofIndex(v, "user_id", "ts",
      carryCols = Seq("ts", "event_id"), buildTie = "event_id").cache()
    println(s"index keys: ${idx.count()}")

    for (round <- 1 to 3) {
      time(s"asof_carry_forward r$round") {
        operators.AsOf.asofJoin(p, v, "user_id", "ts",
          carryCols = Seq("ts", "event_id"), buildTie = "event_id")
      }
      time(s"asof_lookup r$round") {
        operators.AsOf.asofLookup(p, idx, "user_id", "ts",
          carryCols = Seq("ts", "event_id"))
      }
      time(s"asof_join_rank r$round") {
        val vr = v.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
          col("event_id").as("v_id"))
        val w = Window.partitionBy(col("event_id"))
          .orderBy(col("v_ts").desc_nulls_last, col("v_id").desc)
        p.join(vr, p("user_id") === vr("v_user") && col("v_ts") <= p("ts"), "left")
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      }
    }

    val hourly = ev.groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("cnt"))
    val hot = hourly
      .crossJoin(broadcast(hourly.agg(avg(col("cnt")).as("__mean"))))
      .filter(col("cnt") > lit(1.25) * col("__mean"))
      .select((col("h") - expr("INTERVAL 15 MINUTE")).as("w_start"),
        (col("h") + expr("INTERVAL 75 MINUTE")).as("w_end"))
      .cache()
    println(s"hot windows: ${hot.count()}")
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("ts"))

    for (round <- 1 to 3) {
      time(s"range_binned r$round") {
        operators.RangeJoin.pointInInterval(err, "ts", hot, "w_start", "w_end",
          binWidth = 30L * 60 * 1000000)
      }
      time(s"range_bnlj r$round") {
        err.join(hot, col("ts") >= col("w_start") && col("ts") < col("w_end"))
      }
    }

    // the regime that matters: a big interval side (every hourly window,
    // not just hot ones) against every event — points x intervals
    // predicate evaluations for the BNLJ vs pairs-that-share-a-bin
    val all = hourly
      .select((col("h") - expr("INTERVAL 15 MINUTE")).as("w_start"),
        (col("h") + expr("INTERVAL 75 MINUTE")).as("w_end"))
      .cache()
    println(s"all windows: ${all.count()}")
    val pts = ev.select(col("event_id"), col("ts"))
    for (round <- 1 to 3) {
      time(s"range_binned_all r$round") {
        operators.RangeJoin.pointInInterval(pts, "ts", all, "w_start", "w_end",
          binWidth = 30L * 60 * 1000000)
      }
      time(s"range_bnlj_all r$round") {
        pts.join(all, col("ts") >= col("w_start") && col("ts") < col("w_end"))
      }
    }
    spark.stop()
  }
}
