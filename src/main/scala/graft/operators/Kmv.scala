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
    sketchHashed(df, xxhash64(h), k, out)

  /** [[sketch]] over an ALREADY-HASHED long column — the caller picks
    * the hash space. Production uses xxhash64 (64-bit, saturation-free
    * to billions of distinct values); the q177 oracle gate feeds the
    * portable md5-32 prefix instead, whose bottom-k and estimator the
    * DuckDB oracle replays value-for-value (32 bits saturate a KMV at
    * billions of distinct keys — the md5 form is the GATE, not the
    * production posture). */
  def sketchHashed(df: DataFrame, hashed: Column, k: Int, out: String): DataFrame =
    df.select(hashed.as("__h"))
      .agg(BottomKSample(col("__h"), col("__h"), k).as("s"))
      .select(transform(col("s"), x => x.getField("h")).as(out))

  /** Estimate |A∪B|, Jaccard and |A∩B| from two sketch frames (each one
    * row, built with the same k). Output: one row
    * (union_est, jaccard_1e6, inter_est) — all BIGINT: the estimator is
    * hash-deterministic, and integer outputs keep it rerun-stable.
    * `hashOffset`/`hashSpace` normalize the hash to [0, 1): the signed
    * xxhash64 default shifts by 2^63 over 2^64; the md5-32 gate passes
    * (0, 2^32). */
  def overlapEstimate(a: DataFrame, b: DataFrame, k: Int,
                      hashOffset: Double = 9.223372036854776e18,
                      hashSpace: Double = 1.8446744073709552e19): DataFrame = {
    a.crossJoin(b) // 1×1 — the broadcast-scalar pattern (PlanSpec-pinned elsewhere)
      .select(slice(array_sort(array_union(col("ka"), col("kb"))), 1, k).as("u"),
        col("ka"), col("kb"))
      .select(
        size(col("u")).as("nu"),
        size(array_intersect(array_intersect(col("u"), col("ka")), col("kb"))).as("ni"),
        ((element_at(col("u"), size(col("u"))).cast("double") + hashOffset) / hashSpace).as("uk"))
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
