package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join pruning — the shape decontamination (q75) takes
  * when the "small" side outgrows a broadcast hash set.
  *
  * q75 broadcasts the eval shingle set and probes it map-side; that is the
  * right plan while the set fits an executor. A serious benchmark suite at
  * corpus scale (or decontamination against ANOTHER corpus) does not fit:
  * the exact hash set is ~tens of bytes per distinct shingle, while a
  * Bloom filter at 1% false positives is ~9.6 BITS per item — 20-50×
  * smaller, and the only structure that still ships to every task. The
  * composition is the classic two-phase semi join the runtime-filter
  * literature standardizes on (Spark's own InjectRuntimeFilter builds the
  * identical plan for selective joins):
  *
  *   1. one aggregation over the filter side builds the mergeable sketch
  *      (partial filters OR together map-side — wire volume is one
  *      fixed-size bitset per partition, never the shingle set);
  *   2. the probe side streams through `might_contain(bloom, xxhash64(x))`
  *      — a codegen'd scan-side predicate, zero shuffle;
  *   3. survivors (true matches + the fpp tail) flow into the EXACT join,
  *      now survivor-sized instead of corpus-sized. False positives die
  *      there, so the final answer is bit-identical to the unpruned plan —
  *      which is exactly why q125 can share q75's DuckDB oracle.
  *
  * The built filter is a bounded artifact (numBits/8 bytes, set by the
  * caller's item estimate — NOT data-sized), held once on the driver and
  * shipped as a literal into codegen: the same build-once lifecycle as the
  * IVF quantizer (SURVEY lesson 12), not a driver-side collect of data.
  *
  * Both phases reuse Spark's own sketch (`BloomFilterAggregate` /
  * `BloomFilterMightContain`, the pair behind runtime row-group filtering)
  * rather than reimplementing the bitset: identical hashing on both
  * sides is the whole correctness contract.
  */
object Bloom {

  /** Build a Bloom filter over `xxhash64(c)` for every row of `df`.
    * `expectedItems` sizes the bitset (`fpp` is the false-positive rate at
    * exactly that cardinality; overshooting the estimate degrades fpp, it
    * never loses true positives). Returns the serialized filter —
    * `optimalNumBits/8` bytes, independent of the actual data volume. */
  def build(df: DataFrame, c: Column, expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, s"fpp out of (0,1): $fpp")
    // BloomFilterAggregate CLAMPS both arguments to the runtime-filter
    // confs with Math.min — silently, no error. Past the caps the built
    // filter's real fpp collapses toward 1 and the "prune" passes every
    // row while the caller believes they got `fpp`. Fail loudly instead:
    // the caller must raise the confs to the corpus scale first.
    val conf = df.sparkSession.conf
    val maxItems = conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(expectedItems <= maxItems,
      s"expectedItems=$expectedItems exceeds spark.sql.optimizer.runtime.bloomFilter.maxNumItems=$maxItems — " +
        "the aggregate would silently clamp; raise the conf to build at this scale")
    require(optimalNumBits(expectedItems, fpp) <= maxBits,
      s"optimal bitset ${optimalNumBits(expectedItems, fpp)} bits exceeds " +
        s"spark.sql.optimizer.runtime.bloomFilter.maxNumBits=$maxBits — " +
        "the aggregate would silently clamp; raise the conf or accept a larger fpp")
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(c)),
      Literal(expectedItems),
      Literal(optimalNumBits(expectedItems, fpp)))
    val bf = ColumnBridge.column(agg.toAggregateExpression()).as("bf")
    df.agg(bf).head().getAs[Array[Byte]]("bf")
  }

  /** Scan-side membership probe: `might_contain(bloom, xxhash64(c))`.
    * The serialized filter rides into the plan as a foldable binary
    * literal, so the predicate stays inside whole-stage codegen. May
    * return false positives (rate = the build's fpp) and never false
    * negatives — always pair with an exact join downstream when the
    * answer must be exact. */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    ColumnBridge.column(new BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ColumnBridge.expression(xxhash64(c))))

  /** m = -n ln(p) / (ln 2)^2 — the standard optimal-bitset sizing. */
  def optimalNumBits(n: Long, p: Double): Long =
    math.ceil(-n * math.log(p) / (math.log(2) * math.log(2))).toLong
}
