package graft.tools

import graft._

/** Prints the formatted physical plan of one registered query. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(Some("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    SparkEntry.queries(args(0))(spark, dir).explain("formatted")
    spark.stop()
  }
}
