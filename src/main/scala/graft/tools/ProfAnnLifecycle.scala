package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.streaming.AnnStreams

/** Measurement behind the ANN artifact's LSM lifecycle: what a
  * fragmented streaming delta zone costs a probe (many small files per
  * probed cell, one extra union leg), what the tombstone mask costs
  * (one broadcast anti-join), and what compaction buys back. 320k base
  * vectors x 64 dims, 40 streamed micro-batches of 2k (the delta zone
  * then holds ~40 files per touched cell vs the base's one), 5k
  * tombstones. Run: `sbt "runMain graft.tools.ProfAnnLifecycle"`. */
object ProfAnnLifecycle {
  private def vecs(spark: SparkSession, from: Long, n: Long): DataFrame = {
    // deterministic pseudo-random unit-ish embeddings: 64 hash-derived
    // floats per id (no rand() — reruns measure the same artifact)
    val id = col("id")
    spark.range(from, from + n).select(
      id.as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => (pmod(xxhash64(id, j), lit(2000L)).cast("double") / 1000.0 - 1.0)
          .cast("float")).as("embedding"))
  }

  private def countFiles(dir: String): Int = {
    def scan(f: java.io.File): Int =
      if (!f.exists()) 0
      else if (f.isFile) { if (f.getName.endsWith(".parquet")) 1 else 0 }
      else Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .filterNot(_.getName.startsWith("_")).map(scan).sum
    scan(new java.io.File(dir))
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(Some("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prof_ann").toString
    val base = vecs(spark, 0L, 320000L).localCheckpoint(true)
    Similarity.saveIvfIndex(Similarity.ivfIndex(base, nLists = 16), dir)
    val queries = vecs(spark, 1000000L, 64L).localCheckpoint(true)
    def run(tag: String): Unit = {
      val probe = Similarity.ivfTopKFromSaved(spark, dir, queries, k = 10)
      probe.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime
      probe.write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime - t0) / 1e9}%.3f s " +
        s"(cells ${countFiles(s"$dir/cells")} files, " +
        s"delta ${countFiles(s"$dir/delta")} files)")
    }
    run("base as saved     ")
    // 40 streamed micro-batches fragment the delta zone; ONE sink
    // instance, as a real stream would hold it (frozen state loads once)
    val sink = AnnStreams.annIngestSink(dir)
    (0 until 40).foreach { b =>
      sink(vecs(spark, 400000L + b * 2000L, 2000L), b.toLong)
    }
    run("delta 40 batches  ")
    Similarity.deleteFromIndex(spark, dir,
      spark.range(100000L, 105000L).select(col("id").as("vec_id")))
    run("delta + tombstones")
    val cDir = java.nio.file.Files.createTempDirectory("prof_ann_c").toString
    Similarity.compactIvfIndex(spark, dir, cDir)
    val probeC = Similarity.ivfTopKFromSaved(spark, cDir, queries, k = 10)
    probeC.write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime
    probeC.write.format("noop").mode("overwrite").save()
    println(f"compacted (folded) : ${(System.nanoTime - t0) / 1e9}%.3f s " +
      s"(cells ${countFiles(s"$cDir/cells")} files)")
    spark.stop()
  }
}
