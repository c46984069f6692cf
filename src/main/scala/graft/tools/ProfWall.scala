package graft.tools

import graft._

/** Wall-time breakdown for registered queries: DataFrame construction
  * (analysis), physical planning, first execution, steady-state execution
  * — separates driver-side plan cost from cluster compute so optimization
  * targets the right thing (guide §1: measure first; §7.3: planning time
  * is driver-side, single-threaded work).
  *
  * Usage: runMain graft.tools.ProfWall <sfDir> <cpus> <q1,q2,...>
  * Optional 4th arg: conf overrides as k=v,k=v applied before the runs.
  */
object ProfWall {

  /** Per-job wall + per-stage (tasks, taskMs) log, printed per run. */
  private final class JobLog extends org.apache.spark.scheduler.SparkListener {
    import org.apache.spark.scheduler._
    import scala.collection.mutable
    case class St(var name: String = "", var tasks: Int = 0, var taskMs: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, (Long, Long, Seq[Int])]() // id -> (t0, t1, stageIds)
    val stages = mutable.LinkedHashMap[Int, St]()
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs(j.jobId) = (j.time, 0L, j.stageIds.map(_.toInt))
    override def onJobEnd(j: SparkListenerJobEnd): Unit =
      jobs.get(j.jobId).foreach { case (t0, _, s) => jobs(j.jobId) = (t0, j.time, s) }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val st = stages.getOrElseUpdate(s.stageInfo.stageId, St())
      st.name = s.stageInfo.name.takeWhile(_ != '\n').take(60)
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val st = stages.getOrElseUpdate(t.stageId, St())
      st.tasks += 1
      if (t.taskMetrics != null) st.taskMs += t.taskMetrics.executorRunTime
    }
    def reset(): Unit = { jobs.clear(); stages.clear() }
    def report(): String = {
      jobs.map { case (id, (t0, t1, sids)) =>
        val dur = if (t1 > 0) t1 - t0 else -1
        val ss = sids.flatMap(stages.get).map(s => s"${s.tasks}t/${s.taskMs}ms:${s.name.take(30)}").mkString(",")
        f"    job$id%-4d ${dur}%6d ms  stages[$ss]"
      }.mkString("\n")
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = args(1).toInt
    val names = args(2).split(",").toSeq
    val spark = GraftSession.builder(Some(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jl = new JobLog
    spark.sparkContext.addSparkListener(jl)
    if (args.length > 3 && args(3).nonEmpty)
      args(3).split(",").foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      }
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warmup (codegen, file listing, memoized index builds)
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"$name WARMUP-FAIL ${e.getMessage.take(120)}") }
      (1 to 2).foreach { i =>
        org.apache.spark.GraftListenerBusAccess.drain(spark.sparkContext)
        jl.reset()
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val tBuild = ms(t0)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val tPlan = ms(t1)
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val tExec = ms(t2)
        org.apache.spark.GraftListenerBusAccess.drain(spark.sparkContext)
        println(f"$name%-34s run$i build=$tBuild%8.1f ms  plan=$tPlan%8.1f ms  exec=$tExec%8.1f ms")
        if (i == 2) println(jl.report())
      }
    }
    spark.stop()
  }
}
