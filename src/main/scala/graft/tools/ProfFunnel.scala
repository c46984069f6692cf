package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft._
import graft.operators.Funnel

/** Measures q107's funnel realizations on a synthetic event stream
  * (5M events, 100k users, uniform stage mix — noop sink):
  *   - fold:  Funnel.greedy — ONE exchange on user, per-user sorted
  *     array + HOF state machine (per-user memory is history-sized)
  *   - chain: the join-chain form (stage-N min conditioned on stage
  *     N-1, joined back per stage) — 3 aggregates + 2 joins, but every
  *     leg co-locates on the same user hash partitioning, and per-user
  *     memory is O(1) (the unbounded-history fallback)
  * Numbers feed SURVEY §6.
  */
object ProfFunnel {
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
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)

    val ev = spark.range(n).select(
      ((col("id") * 2654435761L) % 100000L).as("u"),
      (col("id") * 7919L % 1000000000L).as("t"),
      (col("id") % 5).cast("int").as("k")) // stages 0,1,2 + non-stage 3,4
      .cache()
    ev.count()

    def chain: DataFrame = {
      val s0 = ev.filter(col("k") === 0).groupBy(col("u")).agg(min(col("t")).as("t1"))
      val s1 = ev.filter(col("k") === 1).join(s0, "u")
        .filter(col("t") > col("t1"))
        .groupBy(col("u"), col("t1")).agg(min(col("t")).as("t2"))
      val s2 = ev.filter(col("k") === 2).join(s1, "u")
        .filter(col("t") > col("t2"))
        .groupBy(col("u"), col("t1"), col("t2")).agg(min(col("t")).as("t3"))
      ev.select(col("u")).distinct()
        .join(s0, Seq("u"), "left").join(s1.select("u", "t2"), Seq("u"), "left")
        .join(s2.select("u", "t3"), Seq("u"), "left")
    }

    for (round <- 1 to 3) {
      println(s"--- round $round (n=$n) ---")
      time("fold") {
        Funnel.greedy(ev.toDF(), col("u"), col("t"),
          when(col("k") < 3, col("k")), nStages = 3)
      }
      time("chain") { chain }
    }
    spark.stop()
  }
}
