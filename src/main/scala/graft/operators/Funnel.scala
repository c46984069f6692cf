package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy funnel progression (q107): earliest completion of an ordered
  * stage sequence per entity, in ONE exchange — events collect to a
  * per-entity time-sorted array and a single fold walks the state
  * machine. Greedy-first is the standard funnel semantics and optimal:
  * the earliest stage-N completion enables the earliest stage-N+1.
  *
  * The per-entity array is bounded by that entity's event history — the
  * right trade for entity-keyed analytics. For unbounded histories run
  * the join-chain realization instead (stage-N min-aggregate joined back
  * per stage, all legs co-located on one entity repartition): same
  * greedy answer, no per-entity buffer.
  */
object Funnel {

  /** Input: (entity, t: Long, k: Int) rows where k is the 0-based stage
    * index (rows with null k — non-stage events — and rows with null t
    * keep the entity in the output at depth 0 but don't advance stages).
    * Output per entity: `entityName`, depth, and UNIT-NEUTRAL stage
    * times t1..tN (whatever unit `t` carried in — the operator never
    * assumes one; callers alias to t1_us etc. as their unit warrants,
    * instead of un-mislabeling a baked-in suffix).
    * Stage advance uses STRICT t ordering (a stage-k event at exactly
    * the stage-(k-1) time does not count). */
  def greedy(events: DataFrame, entity: Column, t: Column, k: Column, nStages: Int,
             entityName: String = "entity"): DataFrame = {
    require(nStages >= 1 && nStages <= 8, "funnel: 1..8 stages")
    val M = Long.MaxValue
    def stField(st: Column, i: Int): Column = st.getField(s"t${i + 1}")
    val collected = events
      .select(entity.as("__e"),
        // null-time stage events are dropped, not folded: a null t would
        // win its stage slot and poison every later comparison (the
        // oracle's MIN(ts) ignores NULLs; same rule as AsOf's null-time
        // build filter)
        when(k.isNotNull && k >= 0 && k < nStages && t.isNotNull,
          struct(t.as("t"), k.as("k"))).as("ev"))
      .groupBy(col("__e"))
      .agg(sort_array(collect_list(col("ev"))).as("evs"))
    val init = struct((0 until nStages).map(i => lit(M).as(s"t${i + 1}")): _*)
    val folded = collected.select(col("__e"),
      aggregate(col("evs"), init, (st, e) =>
        struct((0 until nStages).map { i =>
          val hit =
            if (i == 0) e.getField("k") === 0 && stField(st, 0) === M
            else e.getField("k") === i && stField(st, i - 1) =!= M &&
              stField(st, i) === M && e.getField("t") > stField(st, i - 1)
          when(hit, e.getField("t")).otherwise(stField(st, i)).as(s"t${i + 1}")
        }: _*)).as("st"))
    // build innermost-first: the OUTERMOST when must test the deepest
    // stage, so fold ascending (stage N's test wraps stage N-1's)
    val depth = (1 to nStages).foldLeft(lit(0L)) { (acc, n) =>
      when(stField(col("st"), n - 1) =!= M, n.toLong).otherwise(acc)
    }
    folded.select(
      Seq(col("__e").as(entityName), depth.as("depth")) ++
        (0 until nStages).map(i =>
          when(stField(col("st"), i) =!= M, stField(col("st"), i)).as(s"t${i + 1}")): _*)
  }
}
