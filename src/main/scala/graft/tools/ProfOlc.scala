package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Measurement behind the fused native OLC Expression (OlcEncode11,
  * BASELINE.md): the composed 23-node column tree vs the single
  * StringBuilder kernel on a 6M-coordinate frame. Run:
  * `sbt "runMain graft.tools.ProfOlc"`. */
object ProfOlc {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(Some("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Olc
    val coords = spark.range(6000000).select(
      (lit(29.5) + (col("id") % 40000).cast("double") * lit(0.0001)).as("lat"),
      (lit(34.2) + (col("id") % 17000).cast("double") * lit(0.0001)).as("lng"))
      .localCheckpoint(true)
    def run(tag: String, f: => org.apache.spark.sql.DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime
      f.write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime - t0) / 1e9}%.3f s")
    }
    // interleaved twice: ambient drift shows up as run1/run2 disagreement
    run("composed", coords.select(Olc.encode11Composed(col("lat"), col("lng"))))
    run("native  ", coords.select(Olc.encode11(col("lat"), col("lng"))))
    run("composed", coords.select(Olc.encode11Composed(col("lat"), col("lng"))))
    run("native  ", coords.select(Olc.encode11(col("lat"), col("lng"))))
    spark.stop()
  }
}
