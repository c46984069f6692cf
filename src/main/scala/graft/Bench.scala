package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the given scale factor
  * and prints ONE JSON line. A first untimed pass absorbs JVM/codegen/
  * catalog warmup so the timed pass measures steady-state throughput (the
  * number that scales to cluster runs).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark: SparkSession = GraftSession.builder(Some(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Optional comma-separated filter for local bisection; prefixes work:
    // SPARK_GRAFT_ONLY=q23,q25_ngram_jaccard
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }

    // Full materialization through the noop sink: unlike count(), Catalyst
    // cannot drop final projections/sorts, so projection-heavy queries are
    // honestly measured.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Warmup: run everything once (exercises codegen + file listing).
    queries.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => () }
    }

    // Steady-state seconds: best of two timed runs (local runs share the
    // box with other work; min is the honest throughput estimate). A
    // failing query records -1, never a fake near-zero "fast" time.
    val results = queries.map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { run(fn); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      }
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // stdout does not reliably survive sbt's output forwarding (the driver
    // saw "parsed": null two rounds running), so the file is the contract
    // and the stdout line is for humans.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
    println(json)
    System.err.println(s"[bench] json written to ${out.toAbsolutePath}")
    spark.stop()
  }
}
