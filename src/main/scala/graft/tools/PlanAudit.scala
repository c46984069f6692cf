package graft.tools

import graft._

/** Dumps red-flag findings from every registered query's physical plan:
  * cartesian/nested-loop joins, unfiltered wide scans, and the join/scan
  * inventory — the `.explain("formatted")` review pass, automated.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(Some("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
          "SortMergeJoin" -> plan.contains("SortMergeJoin"),
          "ObjectHashAggregate" -> plan.contains("ObjectHashAggregate")
        ).collect { case (f, true) => f }
        val scans = plan.linesIterator.filter(_.contains("ReadSchema")).map(_.trim.take(150)).toSeq
        val joins = plan.linesIterator.filter(l => l.contains("Join")).map(_.trim.takeWhile(_ != ',').take(80)).toSeq.distinct
        println(s"AUDIT $name flags=[${flags.mkString(",")}] joins=[${joins.mkString(" | ")}]")
        scans.foreach(sc => println(s"  SCAN $sc"))
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage.take(100)}") }
    }
    spark.stop()
  }
}
