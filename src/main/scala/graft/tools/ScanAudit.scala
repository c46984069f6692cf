package graft.tools

import graft._

/** Executes every registered query at sf0.001 and flags duplicate
  * same-table scans in the FINAL adaptive plan (initial-plan section
  * stripped — it always shows pre-reuse duplicates; SURVEY lesson 46).
  * A flagged query is a REVIEW candidate, not automatically a bug:
  * self-joins and differently-filtered slices legitimately scan twice —
  * the question is whether the duplicated subtree repeats expensive
  * per-row work (tokenize/explode/hash), which the taskMs profile in
  * target/bench.json arbitrates. */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(Some("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        df.collect()
        val full = df.queryExecution.executedPlan.toString
        val p = full.split("== Initial Plan ==")(0)
        val scanTables = p.linesIterator.filter(_.contains("FileScan parquet"))
          .flatMap(l => "sf0\\.001/(\\w+)\\.parquet".r.findFirstMatchIn(l).map(_.group(1)))
          .toSeq
        val reused = p.linesIterator.count(_.contains("ReusedExchange"))
        val dup = scanTables.groupBy(identity).filter(_._2.size >= 2)
        if (dup.nonEmpty)
          println(f"SCANAUDIT $name%-28s reused=$reused dupScans=${dup.map { case (t, xs) => s"$t:${xs.size}" }.toSeq.sorted.mkString(",")}")
      } catch { case e: Throwable => println(s"SCANAUDIT $name ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
