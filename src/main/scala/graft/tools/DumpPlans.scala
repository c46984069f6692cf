package graft.tools

import java.nio.file.{Files, Paths}

import graft._

/** Dumps `.explain("formatted")` for a list of queries into
  * plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence
  * artifact (guide §1: capture the plan before and after).
  *
  * Usage: runMain graft.tools.DumpPlans <tag> <suffix> <q1,q2,...> [sfDir]
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = GraftSession.builder(Some("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get(s"plans/$tag")
    Files.createDirectories(outDir)
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.write(outDir.resolve(s"${name}_$suffix.txt"), plan.getBytes("UTF-8"))
        println(s"WROTE plans/$tag/${name}_$suffix.txt (${plan.length} chars)")
      } catch {
        case e: Throwable => println(s"FAIL $name: ${e.getMessage.take(200)}")
      }
    }
    spark.stop()
  }
}
