package graft.tools

/** Replays the driver's flagship smoke check: entry(spark) on sf0.001
  * must return rows. */
object EntrySmoke {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS $n")
    spark.stop()
  }
}
