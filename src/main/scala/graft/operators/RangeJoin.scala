package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — pair each point with every interval containing
  * it. Spark plans a pure inequality join as BroadcastNestedLoopJoin
  * (every point against every interval — quadratic); engines with a
  * native range join (DuckDB's IEJoin, Trino's partitioned range join)
  * exist precisely because this shape matters.
  *
  * Ladder rung (a): make it an EQUI-join by quantizing the time axis into
  * fixed-width bins. Each interval replicates into the bins it overlaps
  * (ceil(span/width) rows — bounded, known up front); each point lands in
  * exactly ONE bin, so the bin equi-join needs no post-dedup, and the
  * residual `start <= t < end` filter inside the join restores exact
  * semantics. Catalyst then picks the right physical join for the data:
  * broadcast-hash when the exploded intervals are small, shuffled-hash /
  * SMJ on the bin key when both sides are huge — and either way the
  * per-task work is pairs-that-share-a-bin, not all-pairs. Bin width
  * tunes replication vs selectivity: ~ the median interval span is a
  * good default (1–2 replicas per interval, residual discards little).
  */
object RangeJoin {

  /** Inner point-in-interval join: rows of `points` × containing rows of
    * `intervals`, on `start <= t < end` (half-open).
    *
    * @param points    point side; all columns pass through
    * @param t         point timestamp column (on `points`)
    * @param intervals interval side; all columns pass through (names must
    *                  not collide with `points`')
    * @param start     inclusive interval start column (on `intervals`)
    * @param end       exclusive interval end column (on `intervals`)
    * @param binWidth  bin width in MICROSECONDS
    */
  /** Replicate each non-empty half-open interval into its covered bins
    * (shared by both joins). sequence() is inclusive-inclusive; the
    * half-open end only owns a bin when the interval crosses into it,
    * hence the epsilon step back. Empty intervals must be dropped FIRST:
    * sequence(a, b) with b < a would silently generate a descending
    * range. The bins-per-interval cap fails FAST inside the row (via
    * raise_error) instead of letting one open-ended sentinel interval
    * (end = 9999-12-31 at a 30-minute binWidth ≈ 140M bins) OOM a task
    * with no hint that binWidth × span is the cause — size binWidth to
    * the data, or close sentinel intervals before joining. */
  private val MaxBinsPerInterval = 1000000L
  private def binned(df: DataFrame, s: String, e: String, bin: String,
                     binWidth: Long): DataFrame = {
    val binOf: Column => Column = c => floor(unix_micros(c) / binWidth)
    val lastBin = binOf(timestamp_micros(unix_micros(col(e)) - 1))
    df.filter(col(s) < col(e))
      .withColumn(bin, explode(sequence(
        binOf(col(s)),
        when(lastBin - binOf(col(s)) > MaxBinsPerInterval,
          raise_error(concat(
            lit(s"[graft.rangejoin] interval spans more than $MaxBinsPerInterval bins at binWidth=$binWidth us: ["),
            col(s).cast("string"), lit(", "), col(e).cast("string"),
            lit(") - widen binWidth or close sentinel intervals")).cast("string")).cast("long")
        ).otherwise(lastBin))))
  }

  def pointInInterval(
      points: DataFrame,
      t: String,
      intervals: DataFrame,
      start: String,
      end: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val binOf: Column => Column = c => floor(unix_micros(c) / binWidth)
    val binnedIntervals = binned(intervals, start, end, "__bin", binWidth)
    val binnedPoints = points.withColumn("__bin", binOf(col(t)))

    binnedPoints
      .join(binnedIntervals,
        binnedPoints("__bin") === binnedIntervals("__bin") &&
          col(t) >= col(start) && col(t) < col(end))
      .drop("__bin")
  }

  /** Inner interval-OVERLAP join: rows of `a` × rows of `b` whose
    * half-open spans intersect (`aStart < bEnd && bStart < aEnd`) — the
    * interval×interval extension of [[pointInInterval]] (sessions ×
    * incident windows, visits × campaigns). Column names must not
    * collide across the two sides.
    *
    * Both sides replicate into their covered bins, and the equi-join on
    * the bin finds every overlapping pair in at least one shared bin —
    * possibly MANY (two long intervals share every bin they both cover).
    * Instead of a pair-distinct afterwards (an output-sized extra
    * exchange), each pair is emitted from exactly ONE canonical bin: the
    * bin holding the overlap's START (`greatest(aStart, bStart)`), a bin
    * both sides cover by construction. No dedup anywhere, work stays
    * pairs-that-share-a-bin, and the residual restores exact semantics.
    *
    * EMPTY intervals (start == end) never pair, on either side — they
    * are dropped before binning (the predicate alone would let an empty
    * interval sitting inside the other side's span "overlap"); a
    * hand-written inequality join that wants them must filter the same
    * way. The oracle replays this contract.
    */
  def intervalOverlap(
      a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val binOf: Column => Column = c => floor(unix_micros(c) / binWidth)
    val ba = binned(a, aStart, aEnd, "__bin_a", binWidth)
    val bb = binned(b, bStart, bEnd, "__bin_b", binWidth)
    ba.join(bb,
        col("__bin_a") === col("__bin_b") &&
          col(aStart) < col(bEnd) && col(bStart) < col(aEnd) &&
          col("__bin_a") === binOf(greatest(col(aStart), col(bStart))))
      .drop("__bin_a", "__bin_b")
  }
}
