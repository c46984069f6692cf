package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered parquet layout — multi-dimensional
  * data skipping for the scan side.
  *
  * Partition directories (`writeParquet(partitionCols)`) prune ONE
  * dimension at directory granularity; bucketing co-locates joins. What
  * neither gives is a layout where range predicates on SEVERAL columns
  * each skip most of the data — the shape of a 100 TB scan like
  * "user ∈ [a,b] AND day ∈ [c,d]". Sorting by (x, y) makes x-predicates
  * perfect and y-predicates useless; the Z-curve interleaves the BITS of
  * per-column rank buckets so files own small hyper-rectangles of the
  * key space, and every parquet min/max statistic (file footer and
  * row-group alike) becomes a tight box the reader prunes against —
  * the same layout trick Delta OPTIMIZE ZORDER / Hudi clustering
  * standardize, built here from plain Spark pieces.
  *
  * Build cost (documented, not hidden): one `approxQuantile` pass
  * computes per-column rank cuts (a GK sketch per column — a bounded
  * driver artifact like the IVF centroids), and `repartitionByRange`
  * adds its usual sampling pass + one shuffle of the data into curve
  * order. That is the standard price of ANY clustering rewrite; it is
  * paid once per layout build and amortized over every scan after.
  *
  * The per-row math is all codegen'd integer arithmetic: bucket id =
  * count of cuts below the value (an unrolled when-chain — no HOF, no
  * interpreted lambdas), z-value = bit interleave of the bucket ids
  * (shift/and/or tree). NULLs land in bucket 0 and cluster together at
  * the curve origin.
  */
object ZOrder {

  /** Z-value column over numeric columns `zCols`, using `cuts(d)` as the
    * ascending rank boundaries of dimension d (length 2^bits − 1). */
  private[sources] def zValue(zCols: Seq[String], cuts: Seq[Array[Double]], bits: Int): Column = {
    val buckets = zCols.zip(cuts).map { case (name, cs) =>
      // an all-NULL column yields ZERO quantile cuts (approxQuantile
      // skips nulls) — fold from lit(0L) so the column degenerates to
      // bucket 0 (the documented NULL posture) instead of crashing
      // plan construction with empty.reduceLeft
      cs.foldLeft(lit(0L): Column)((acc, c) =>
        acc + when(col(name).cast("double") > c, 1L).otherwise(0L))
    }
    val d = buckets.size
    (0 until bits).flatMap { j =>
      buckets.zipWithIndex.map { case (b, dim) =>
        shiftleft(shiftright(b, j).bitwiseAND(1L), j * d + dim)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` as `nFiles` parquet files clustered along the Z-curve of
    * `zCols` (numeric/date-castable). Each output file covers a small
    * hyper-rectangle of the zCols space, so its footer min/max prunes
    * multi-column range scans (ZOrderSpec measures the file-level
    * skipping against an unclustered layout of the same file count). */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    nFiles: Int = 64, bits: Int = 6): Unit = {
    require(zCols.nonEmpty, "zCols must be non-empty")
    require(bits >= 1 && bits <= 12, s"bits out of [1,12]: $bits")
    require(bits * zCols.size <= 63,
      s"bits*columns = ${bits * zCols.size} exceeds 63: the interleave would " +
        "wrap Java's long shift (mod 64) and silently scramble the curve")
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    val cuts = df.stat.approxQuantile(zCols.toArray, probs, 0.001)
    df.withColumn("__z", zValue(zCols, cuts.toSeq, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
  }
}
