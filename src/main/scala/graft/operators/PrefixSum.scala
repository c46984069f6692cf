package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running sums — the two-level prefix-sum decomposition of
  * `SUM(value) OVER (PARTITION BY part ORDER BY ord)` for partition keys
  * whose cardinality is STRUCTURALLY low (a language column, a 16-way
  * shard id).
  *
  * Why the plain window is a 100 TB defect: Spark executes one window
  * partition as ONE task — a sort of every row sharing the key — and
  * neither AQE skew handling (which rewrites joins, never windows) nor
  * more executors can split it. A corpus that is 90% one language
  * serializes its packing stage into a single billions-of-rows sort no
  * matter the cluster size. The hot/cold routing that fixed the
  * data-skewed hash windows (Dedup.passageMarked) does not apply here:
  * every key is "hot" by construction.
  *
  * The decomposition (the classic parallel scan, in relational form):
  *
  *   1. derive a SUB-BUCKET from the window's own order key — a value
  *      monotone in the ordering (`doc_id div 65536`, `hash div 2^20`),
  *      so every row of bucket b precedes every row of bucket b+1 within
  *      its part. Rows shuffle ONCE on (part, bucket); the local running
  *      sum is a window over (part, bucket) whose tasks are bounded by
  *      the bucket width, not the corpus.
  *   2. per-(part, bucket) totals aggregate ABOVE that same exchange
  *      (same grouping key as the shuffle ⇒ no second exchange of raw
  *      rows, and ReuseExchange dedups the scan — the upstream pipeline
  *      runs once). Because `value >= 0`, the bucket total is
  *      `max(local cum)` — no second sum pass.
  *   3. the exclusive prefix over bucket totals runs on a frame of
  *      ≤ (#parts × #buckets) AGGREGATED rows — the only per-part window
  *      left, bounded by corpus/width (q70) or a constant (q82), never
  *      by the corpus — and joins back as a BROADCAST on (part, bucket).
  *   4. cum = base + local cum, map-side.
  *
  * Identical output to the monolithic window: buckets respect the order,
  * long addition is associative, and the order key is total (unique
  * within part), so RANGE-vs-ROWS framing cannot differ. The streaming
  * corpus sink (DocumentStreams.corpusBuildSink) proves the same
  * base+delta decomposition live: its stored per-lang base is this
  * operator's step 3 folded over batches.
  *
  * Preconditions (assertion-free by design — these are contracts of the
  * call sites, spec-pinned in PrefixSumSpec):
  *   - `value` is non-negative (token counts, row counts) — step 2's
  *     max-as-total needs a non-decreasing running sum;
  *   - the order key is unique within a part (doc_id, (hash, doc_id));
  *   - `bucket` is monotone non-decreasing in the window order;
  *   - part/bucket columns are non-null (the base join is null-unsafe).
  */
object PrefixSum {

  /** `cumName` = running sum of `value` over rows of the same `partCols`
    * ordered by `orderCols`, computed with bounded window tasks.
    *
    * `bucket` must be a long expression over the input columns, monotone
    * in `orderCols` within each part (derive it from the LEADING order
    * column). Width tuning: each (part, bucket) group becomes one window
    * task (keep it ~10^4-10^6 rows); the totals frame carries one row
    * per non-empty (part, bucket) and must stay broadcastable.
    */
  def runningSum(df: DataFrame, partCols: Seq[String], bucket: Column,
                 orderCols: Seq[Column], value: Column,
                 cumName: String): DataFrame = {
    val pc = partCols.map(col)
    // the non-null precondition, enforced BEFORE the two branches fork:
    // without it the base join pushes its inferred isnotnull filters
    // asymmetrically (probe side below the exchange, build side above
    // the window), the two raw-exchange subtrees stop canonicalizing
    // equal, and AQE's stage cache re-runs the whole upstream pipeline
    // instead of reusing the shuffle
    val withB = df.withColumn("__pfx_bucket", bucket.cast("long"))
      .filter((pc :+ col("__pfx_bucket")).map(_.isNotNull).reduce(_ && _))
    val keys = pc :+ col("__pfx_bucket")
    // ONE raw-row exchange, task size bounded by the bucket width
    val localW = Window.partitionBy(keys: _*).orderBy(orderCols: _*)
    val cumLocal = withB.withColumn("__pfx_cum", sum(value).over(localW))
    // totals ride the SAME exchange (grouping == shuffle key ⇒ no new
    // exchange; ReuseExchange makes the upstream pipeline run once) —
    // max of a non-decreasing running sum is the bucket total
    val totals = cumLocal.groupBy(keys: _*)
      .agg(max(col("__pfx_cum")).as("__pfx_sub"))
    // exclusive prefix over ≤ (#parts × #buckets) AGGREGATED rows — the
    // only per-part window, never corpus-sized
    val prefixW = Window.partitionBy(pc: _*).orderBy(col("__pfx_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = totals
      .withColumn("__pfx_base", coalesce(sum(col("__pfx_sub")).over(prefixW), lit(0L)))
      .drop("__pfx_sub")
    cumLocal
      .join(broadcast(bases), partCols :+ "__pfx_bucket")
      .withColumn(cumName, col("__pfx_base") + col("__pfx_cum"))
      .drop("__pfx_bucket", "__pfx_base", "__pfx_cum")
  }

  /** `rankName` = `row_number() OVER (PARTITION BY partCols ORDER BY
    * orderCols)` as a running count — the same decomposition with
    * value = 1, for global-position assignment (q82 shard positions). */
  def rowNumber(df: DataFrame, partCols: Seq[String], bucket: Column,
                orderCols: Seq[Column], rankName: String): DataFrame =
    runningSum(df, partCols, bucket, orderCols, lit(1L), rankName)
}
