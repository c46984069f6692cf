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
    * the probe's time IS matched (<= semantics).
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

    val taggedBuild = build.select(
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
}
