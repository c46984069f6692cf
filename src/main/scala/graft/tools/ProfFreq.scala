package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft._
import graft.functions.expressions.FreqItemsSketch

/** Measures the Misra-Gries heavy-hitters aggregate (q98's
  * freq_items_sketch) against the exact encodings, in the regime that
  * motivates it: per-group top-k over a LARGE vocabulary. The exact form
  * must shuffle one row per (group × distinct token) and then rank them;
  * the sketch shuffles one ≤capacity-entry summary per (group ×
  * partition) no matter the vocabulary. Three branches:
  *   - sketch: groupBy(g).agg(freq_items_sketch)
  *   - exact_node: groupBy(g, tok).count + TopKPerKey-lowered rank
  *   - exact_window: same with the naive row_number window (rule off)
  * Run on the real corpus (small vocab — sketch exact there) and on a
  * synthetic zipf-ish stream with a 10M-token vocabulary. Numbers feed
  * SURVEY §6.
  */
object ProfFreq {
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
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)

    // zipf-ish: half the stream concentrated on 64 hot tokens, half
    // spread over a 10M-token long tail, 16 groups
    val df = spark.range(n).select(
      (col("id") % 16).as("g"),
      when(col("id") % 2 === 0,
        concat(lit("hot"), col("id") % 64))
        .otherwise(concat(lit("t"), (col("id") * 2654435761L) % 10000000L))
        .as("tok"))
      .cache()
    df.count()

    def exactCounts = df.groupBy(col("g"), col("tok")).agg(count(lit(1)).as("cnt"))

    for (round <- 1 to 3) {
      time(s"sketch r$round") {
        df.groupBy(col("g")).agg(FreqItemsSketch(col("tok"), 4096, 10).as("top"))
          .select(col("g"), explode(col("top")))
      }
      spark.conf.set(graft.plans.TopKPerKeyRewrite.EnabledKey, "true")
      time(s"exact_node r$round") {
        val w = Window.partitionBy(col("g")).orderBy(col("cnt").desc, col("tok"))
        exactCounts.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10).drop("rk")
      }
      spark.conf.set(graft.plans.TopKPerKeyRewrite.EnabledKey, "false")
      time(s"exact_window r$round") {
        val w = Window.partitionBy(col("g")).orderBy(col("cnt").desc, col("tok"))
        exactCounts.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10).drop("rk")
      }
    }
    df.unpersist()
    spark.stop()
  }
}
