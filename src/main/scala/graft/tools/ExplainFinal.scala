package graft.tools

import graft._

/** Executes one registered query (noop write) and prints the FINAL
  * adaptive plan — the one with runtime exchange/stage reuse resolved. */
object ExplainFinal {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(Some("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = SparkEntry.queries(args(0))(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    println(p)
    println("FINAL ReusedExchange/QueryStage markers: " +
      p.linesIterator.count(l => l.contains("ReusedExchange") || l.contains("ReusedQueryStage")))
    spark.stop()
  }
}
