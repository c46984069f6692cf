package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.expressions.BottomKSample

/** KMV (k-minimum-values) sketch set operations — distinct-set overlap
  * estimation between corpora WITHOUT joining them.
  *
  * The exact overlap between two snapshots is a distinct-key join: every
  * distinct content hash of BOTH corpora crosses the wire. The KMV
  * estimate reduces each side to its k smallest element hashes (the
  * bottom-k-by-hash aggregate the fixed-k sampler already ships — the
  * kept key set IS a KMV sketch, noted at BottomKSample), and every set
  * statistic then computes on two k-entry arrays: union cardinality from
  * the k-th minimum (est = (k−1)/u₍ₖ₎ with hashes normalized to [0,1)),
  * Jaccard from the fraction of the merged sketch present in both sides
  * (Beyer et al., SIGMOD'07), intersection as their product. Wire volume
  * per side: ≤ k longs per partition (mergeable partial heaps), meeting
  * in one 1×1 broadcast join — the sketches can even ship between
  * clusters as a few KB, which is the actual use (is MY corpus already
  * inside THAT corpus?).
  *
  * Degenerate regime, used by the spec as its own gate: when the true
  * union fits the sketch (|A∪B| ≤ k) every element is present and all
  * three estimates are EXACT.
  */
object Kmv {

  /** One-row frame: the KMV sketch of the distinct values of `h` (any
    * type — keyed by xxhash64), as `col`: array<bigint> ascending.
    * ONE pass, no pre-distinct: the bottom-k buffer dedups by
    * comparator equality, so duplicates can never crowd out distinct
    * values — the wire really is ≤ k longs per partition (a distinct()
    * here would shuffle EVERY distinct hash of the corpus first,
    * exactly the cost the sketch exists to avoid). */
  def sketch(df: DataFrame, h: Column, k: Int, out: String): DataFrame =
    df.select(xxhash64(h).as("__h"))
      .agg(BottomKSample(col("__h"), col("__h"), k).as("s"))
      .select(transform(col("s"), x => x.getField("h")).as(out))

  /** Estimate |A∪B|, Jaccard and |A∩B| from two sketch frames (each one
    * row, built with the same k). Output: one row
    * (union_est, jaccard_1e6, inter_est) — all BIGINT: the estimator is
    * hash-deterministic, and integer outputs keep it rerun-stable. */
  def overlapEstimate(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    // 2^64 as double; hash u ∈ [Long.Min, Long.Max] normalizes to
    // (u − Long.Min) / 2^64 ∈ [0, 1).
    val two64 = 1.8446744073709552e19
    a.crossJoin(b) // 1×1 — the broadcast-scalar pattern (PlanSpec-pinned elsewhere)
      .select(slice(array_sort(array_union(col("ka"), col("kb"))), 1, k).as("u"),
        col("ka"), col("kb"))
      .select(
        size(col("u")).as("nu"),
        size(array_intersect(array_intersect(col("u"), col("ka")), col("kb"))).as("ni"),
        ((element_at(col("u"), size(col("u"))).cast("double") + two64 / 2) / two64).as("uk"))
      .select(
        when(col("nu") < k, col("nu").cast("double"))
          .otherwise((lit(k - 1).cast("double")) / col("uk")).as("union_d"),
        (col("ni").cast("double") / col("nu")).as("j"))
      .select(
        round(col("union_d")).cast("long").as("union_est"),
        round(col("j") * 1e6).cast("long").as("jaccard_1e6"),
        round(col("j") * col("union_d")).cast("long").as("inter_est"))
  }
}
