package graft

import org.apache.spark.sql.functions._
import graft.sources.ZOrder

/** Z-order clustered layout (sources.ZOrder): file-level data skipping. */
class ZOrderSpec extends SpecBase {
  import spark.implicits._

  // 200k rows over a 10k x 10k key space, both coordinates hash-derived
  // (deterministic, uniform, uncorrelated).
  private lazy val data = spark.range(200000)
    .select(col("id"),
      (graft.operators.Sampling.saltedHash32(col("id"), "zx") % 10000).as("x"),
      (graft.operators.Sampling.saltedHash32(col("id"), "zy") % 10000).as("y"))

  /** Files whose [min,max] box on (x, y) intersects the query box — the
    * set a stats-pruning reader must open. */
  private def filesOverlapping(path: String, x0: Long, x1: Long, y0: Long, y1: Long): (Long, Long) = {
    val stats = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("xmin"), max("x").as("xmax"),
           min("y").as("ymin"), max("y").as("ymax"))
      .cache()
    val total = stats.count()
    val hit = stats.filter(col("xmax") >= x0 && col("xmin") <= x1 &&
                           col("ymax") >= y0 && col("ymin") <= y1).count()
    stats.unpersist()
    (hit, total)
  }

  test("z-ordered files cover small boxes: 2-D range scans skip most files; rows preserved") {
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val flat = s"$base/flat"
    val zord = s"$base/zord"
    // unclustered baseline at the same file count
    data.repartition(32).write.mode("overwrite").parquet(flat)
    ZOrder.writeZOrdered(data, zord, Seq("x", "y"), nFiles = 32)

    // row multiset preserved through the rewrite
    val a = spark.read.parquet(zord).agg(count("*"), sum("id"), sum("x"), sum("y")).head()
    val b = data.agg(count("*"), sum("id"), sum("x"), sum("y")).head()
    assert(a == b)

    // 5% x 5% query box: hash-scattered files ALL overlap it; z-ordered
    // files own small hyper-rectangles, so only a handful do
    val (hitFlat, totFlat) = filesOverlapping(flat, 4000, 4500, 7000, 7500)
    val (hitZ, totZ) = filesOverlapping(zord, 4000, 4500, 7000, 7500)
    assert(totFlat == 32 && totZ == 32, s"file counts $totFlat/$totZ")
    assert(hitFlat == 32, s"baseline should be unprunable, got $hitFlat")
    assert(hitZ <= 8, s"z-order should prune most files, still opening $hitZ of 32")
  }

  test("single-dimension predicates also prune on the z layout") {
    val base = java.nio.file.Files.createTempDirectory("zorder1d").toString
    ZOrder.writeZOrdered(data, base, Seq("x", "y"), nFiles = 32)
    val (hit, tot) = filesOverlapping(base, 0, 600, Long.MinValue, Long.MaxValue)
    // 6% x-slice: the curve localizes x at every scale, pruning most files
    assert(tot == 32 && hit <= 12, s"x-only predicate still opens $hit of $tot")
  }

  test("null cluster keys land at the curve origin, not across all files") {
    val withNulls = data.withColumn("x",
      when(col("id") % 100 === 0, lit(null)).otherwise(col("x")))
    val base = java.nio.file.Files.createTempDirectory("zordernull").toString
    ZOrder.writeZOrdered(withNulls, base, Seq("x", "y"), nFiles = 32)
    val nullFiles = spark.read.parquet(base)
      .filter(col("x").isNull)
      .select(input_file_name()).distinct().count()
    assert(nullFiles <= 16, s"null keys spread across $nullFiles files")
    assert(spark.read.parquet(base).filter(col("x").isNull).count() == 2000)
  }
}
