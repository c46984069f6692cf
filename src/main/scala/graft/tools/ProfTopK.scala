package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft._
import graft.operators.TopK

/** Measures the TopKPerKey plan node (with rank reassignment — the exact
  * drop-in used by q26/q27/q40) against the row_number window encoding,
  * in the two regimes that matter: many keys with small groups (the
  * grouped-report shape) and few keys with huge groups (the ANN shape —
  * every candidate scored against k queries). The window shuffles and
  * sorts EVERY row; the node trims each input partition to ≤ k rows per
  * key first. Numbers feed SURVEY §6.
  */
object ProfTopK {
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
    // the window branch IS the naive baseline — keep the optimizer rule
    // from silently lowering it onto the very node under measurement
    spark.conf.set(graft.plans.TopKPerKeyRewrite.EnabledKey, "false")
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)

    // pseudo-random order column so heaps/sorts do real comparisons
    def frame(nKeys: Long) = spark.range(n).select(
      (col("id") % nKeys).as("key"),
      (col("id") * 2654435761L % 1000003L).as("v"),
      col("id"))

    for ((nKeys, tag) <- Seq(100000L -> "many_keys", 8L -> "few_keys_ann_shape")) {
      val df = frame(nKeys).cache()
      df.count()
      for (round <- 1 to 3) {
        time(s"node_$tag r$round") {
          TopK.topKWithRank(df, col("key"), Seq(col("v"), col("id")), 5, "rk")
        }
        time(s"window_$tag r$round") {
          val w = Window.partitionBy(col("key")).orderBy(col("v"), col("id"))
          df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
        }
      }
      df.unpersist()
    }
    spark.stop()
  }
}
