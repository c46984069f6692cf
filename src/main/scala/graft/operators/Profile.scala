package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed table profiler — the data-quality report every ingest runs
  * first (reference posture: srm_etl leans on dataflows' row-count/field
  * stats; a 100 TB corpus needs the same numbers without rescanning per
  * column).
  *
  * TWO scans total regardless of column count:
  *   - pass A: ONE map-only aggregate row carrying row count + per-column
  *     non-null count and typed min/max (rendered to strings post-agg);
  *   - pass B: unpivot to (col_name, value) and count distincts grouped
  *     by column — Catalyst plans it as partial-distinct on
  *     (col_name, value) before the exchange, so the wire carries each
  *     distinct value once per partition, NEVER the raw rows.
  *
  * Why not one pass with N count(DISTINCT col) aggregates: multiple
  * distinct aggregates plan through Expand, which multiplies every
  * scanned row by the number of distinct aggregates BEFORE any combine —
  * at 16 columns that is a 16× row blowup feeding the shuffle. The
  * unpivot pays the same 16× only into an immediately-collapsing partial
  * aggregate, which is the difference between wire volume O(distincts)
  * and O(rows × cols).
  *
  * Floats render through DECIMAL(18,2) so the report is engine-portable
  * (shortest-roundtrip double printing differs across engines); NDV for
  * floats counts the rendered value — injective for fixed-2-decimal data,
  * documented as render-space NDV otherwise.
  */
object Profile {

  private def render(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType => c.cast(DecimalType(18, 2)).cast(StringType)
    case _ => c.cast(StringType)
  }

  /** Profile `cols` of `df`: one row per column —
    * (col_name, n_rows, n_nulls, n_distinct, min_s, max_s).
    *
    * `repartitionTo`: the SMALL-SPLIT regime knob. Both passes are
    * compute-heavy per row (#cols aggregate updates / renders), so on a
    * table with fewer parquet splits than cores they run single-threaded;
    * repartitioning first makes parallelism follow CPU — and because both
    * passes then consume the IDENTICAL exchange, Catalyst's ReuseExchange
    * collapses the plan to ONE scan + one shuffle + two aggregate
    * consumers (PlanSpec pins it). At 100 TB splits are plentiful and a
    * full-table shuffle is the wrong trade: leave it None there — the
    * plan becomes two shuffle-free scans instead. */
  def profile(df: DataFrame, cols: Seq[String], repartitionTo: Option[Int] = None): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val types = cols.map(c => c -> df.schema(c).dataType).toMap
    val projected = df.select(cols.map(col): _*)
    val base = repartitionTo.map(projected.repartition(_)).getOrElse(projected)

    // pass A: single aggregate row, then stack it back out to per-column rows
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__n"),
        render(min(col(c)), types(c)).as(s"${c}__min"),
        render(max(col(c)), types(c)).as(s"${c}__max"))
    }
    val one = base.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stackArgs = cols.flatMap { c =>
      Seq(lit(c), col(s"${c}__n"), col(s"${c}__min"), col(s"${c}__max"))
    }
    val passA = one.select(col("__rows"),
        stack((Seq(lit(cols.size)) ++ stackArgs): _*)
          .as(Seq("col_name", "n_vals", "min_s", "max_s")))
      .select(col("col_name"), col("__rows").as("n_rows"),
        (col("__rows") - col("n_vals")).as("n_nulls"), col("min_s"), col("max_s"))

    // pass B: unpivot + grouped exact distinct — partial-combined on
    // (col_name, value) before the exchange, never the multi-distinct
    // Expand (which would multiply every scanned row by #cols pre-combine)
    val unpivotArgs = cols.flatMap { c => Seq(lit(c), render(col(c), types(c))) }
    val passB = base
      .select(stack((Seq(lit(cols.size)) ++ unpivotArgs): _*)
        .as(Seq("col_name", "v")))
      .groupBy(col("col_name"))
      .agg(count_distinct(col("v")).as("n_distinct"))

    // both sides are #cols rows — broadcast join, deterministic output
    passA.join(broadcast(passB), Seq("col_name"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
        col("min_s"), col("max_s"))
  }

  /** ONE-pass variant for the sketch regime: approx NDV
    * (HyperLogLog++, rsd 2%) rides the same aggregate row as the stats,
    * so the whole profile is a single scan with no unpivot, no second
    * exchange, and ~KB of aggregate state per column. Sketch values are
    * engine-specific (not oracle-replayable) — q104 registers the exact
    * form; this is the 100 TB swap, same posture as q74's
    * percentile_approx note. */
  def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val types = cols.map(c => c -> df.schema(c).dataType).toMap
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__n"),
        approx_count_distinct(render(col(c), types(c)), rsd = 0.02).as(s"${c}__d"),
        render(min(col(c)), types(c)).as(s"${c}__min"),
        render(max(col(c)), types(c)).as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stackArgs = cols.flatMap { c =>
      Seq(lit(c), col(s"${c}__n"), col(s"${c}__d"), col(s"${c}__min"), col(s"${c}__max"))
    }
    one.select(col("__rows"),
        stack((Seq(lit(cols.size)) ++ stackArgs): _*)
          .as(Seq("col_name", "n_vals", "n_distinct", "min_s", "max_s")))
      .select(col("col_name"), col("__rows").as("n_rows"),
        (col("__rows") - col("n_vals")).as("n_nulls"), col("n_distinct"),
        col("min_s"), col("max_s"))
  }
}
