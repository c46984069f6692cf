package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each probe row, the single most recent build-side row
  * with the same key whose time is <= the probe's time (the kdb `aj` /
  * Flink temporal-join / pandas `merge_asof` operator; attribution and
  * point-in-time-correct feature lookup both reduce to it).
  *
  * Spark has no native as-of join, and the join encoding
  * (`probe JOIN build ON key AND b.ts <= p.ts`, keep rank 1) explodes to
  * every (probe, earlier-build) pair before discarding all but one —
  * quadratic inside a key, a non-starter at 100 TB. This is ladder
  * rung (a): compose existing operators. Union-tag both sides and carry
  * the build row forward as ONE struct with `last(_, ignoreNulls)` over
  * (key ORDER BY time): one hash exchange on the key, one
  * sort-within-partition, linear scan — build rows are visited once,
  * never paired. Carrying a single struct (not per-column lasts) keeps
  * the attached values atomic even when individual build fields are null.
  */
object AsOf {

  /** Left as-of join.
    *
    * @param probe     left side; all its columns pass through
    * @param build     right side; only `key`, `time`, `buildTie` and
    *                  `carryCols` are read
    * @param key       equi-key column name present on both sides
    * @param time      event-time column name present on both sides
    * @param carryCols build columns to attach (may include `time`)
    * @param buildTie  build column ordering ties at equal `time`
    *                  (largest wins); pass a unique id for determinism
    *
    * Output: probe columns ++ carryCols (each as s"$prefix$c"), all null
    * when no build row precedes the probe row. A build row at exactly
    * the probe's time IS matched (<= semantics). Build rows with a NULL
    * `time` never match any probe (b.ts <= p.ts is never true for NULL)
    * — filtered here, because the default nulls-first sort would
    * otherwise carry them forward as "earliest", diverging from both the
    * join+rank encoding and [[asofLookup]].
    */
  def asofJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      time: String,
      carryCols: Seq[String],
      buildTie: String,
      prefix: String = "asof_"): DataFrame = {
    val probeCols = probe.columns
    val passthrough = probeCols.filterNot(Set(key, time))

    // NULL-KEY build rows filtered for the same reason as null times:
    // Window.partitionBy groups NULLs into one partition, so a null-key
    // build row would carry forward onto null-key probes — while the
    // join+rank encoding and asofLookup (equi-joins) never match NULL
    // keys. With them gone, null-key probe rows fall through with null
    // carry columns on all three realizations (AsOfSpec pins it).
    val taggedBuild = build.filter(col(time).isNotNull && col(key).isNotNull).select(
      col(key) +: col(time) +: lit(0).as("__tag") +: col(buildTie).as("__tie") +:
        struct(carryCols.map(col): _*).as("__b") +:
        passthrough.map(c => lit(null).cast(probe.schema(c).dataType).as(c)): _*)
    val bType = taggedBuild.schema("__b").dataType
    val taggedProbe = probe.select(
      col(key) +: col(time) +: lit(1).as("__tag") +:
        lit(null).cast(build.schema(buildTie).dataType).as("__tie") +:
        lit(null).cast(bType).as("__b") +:
        passthrough.map(col): _*)

    // tag orders build BEFORE probe at equal time (<= semantics); __tie
    // totalizes the order across build duplicates at one timestamp, so
    // "last" is engine-independent.
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__tag"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedBuild.unionByName(taggedProbe)
      .withColumn("__asof", last(col("__b"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(probeCols.map(col) ++
        carryCols.map(c => col("__asof").getField(c).as(s"$prefix$c")): _*)
  }

  /** The LOOKUP-shaped as-of realization: the build side pre-aggregates
    * to one row per key carrying its time-sorted history array, and each
    * probe row binds via a plain equi-join + "last history entry <= t"
    * projection. Same semantics as [[asofJoin]] (AsOfSpec pins equality)
    * with different applicability: the probe side never reshuffles or
    * sorts — the index broadcasts — and a stream-static equi-join is
    * fully supported by Structured Streaming, so this form enriches an
    * unbounded stream with zero streaming state (see
    * [[graft.streaming.EventStreams.asofEnrichStream]]).
    *
    * The cost moves to the build side: one key's whole history must fit
    * in an array. That is the dimension-snapshot regime (slowly-changing
    * attributes, rates, configs) — for high-churn keys, compact the
    * history first (e.g. keep the latest row per (key, hour)); for
    * build sides that outgrow broadcast entirely, use [[asofJoin]].
    */
  def asofIndex(
      build: DataFrame,
      key: String,
      time: String,
      carryCols: Seq[String],
      buildTie: String): DataFrame =
    // null-time build rows can never satisfy __t <= t; drop them here so
    // the index matches asofJoin's (filtered) carry-forward exactly
    build.filter(col(time).isNotNull).groupBy(col(key))
      // struct array_sort orders by fields left-to-right: (time, tie) —
      // the same total order asofJoin's carry-forward walks, so "last
      // matching entry" breaks ties identically (largest wins)
      .agg(array_sort(collect_list(struct(
        col(time).as("__t"), col(buildTie).as("__tie"),
        struct(carryCols.map(col): _*).as("__c")))).as("__hist"))

  /** Probe an [[asofIndex]]: left equi-join on the key, then take the
    * last history entry at-or-before the probe time (null when none or
    * the key is absent). Works identically on batch and streaming probe
    * frames.
    */
  def asofLookup(
      probe: DataFrame,
      index: DataFrame,
      key: String,
      time: String,
      carryCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val probeCols = probe.columns
    probe.join(broadcast(index), Seq(key), "left")
      // try_element_at: "no entry at-or-before t" must be a null, not an
      // ANSI out-of-bounds error on the empty filtered array
      .withColumn("__m",
        try_element_at(filter(col("__hist"), e => e.getField("__t") <= col(time)), lit(-1)))
      .select(probeCols.map(col) ++
        carryCols.map(c => col("__m").getField("__c").getField(c).as(s"$prefix$c")): _*)
  }
}
