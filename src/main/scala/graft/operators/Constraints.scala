package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-constraint checks — the validation report an ingest
  * runs next to [[Profile]] (reference posture: srm_etl validates staged
  * resources field-by-field; a warehouse validates RELATIONS — key
  * uniqueness and referential integrity — before anything joins on them).
  *
  * Each check is one scan of the child table producing one summary row
  * (check_name, n_checked, n_violations):
  *
  *  - uniqueness: groupBy(key) → count keys seen more than once. Two
  *    partial-combining aggregates; wire volume is distinct keys per
  *    partition, never rows.
  *  - referential: child LEFT JOIN parent-keys (distinct, projected to
  *    the key — broadcast-sized for any realistic dimension) counting
  *    parent-misses in the same pass as the row count: no anti-join +
  *    second scan for the total, and null child keys count as
  *    violations (an FK that is null is a missing reference, not a
  *    match — the SQL-standard anti-join would silently pass them).
  */
object Constraints {

  /** (check_name, n_checked, n_violations): distinct `key` values of `df`
    * appearing in more than one row. */
  def uniqueKey(df: DataFrame, key: String, checkName: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .agg(count(lit(1)).as("n_checked"),
        count(when(col("__n") > 1, 1)).as("n_violations"))
      .select(lit(checkName).as("check_name"), col("n_checked"), col("n_violations"))

  /** (check_name, n_checked, n_violations): child rows whose `childKey`
    * has no match in `parent`.`parentKey` (null child keys violate). */
  def referential(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String, checkName: String): DataFrame = {
    val pk = parent.select(col(parentKey).as("__pk")).distinct()
    child.select(col(childKey).as("__ck"))
      .join(broadcast(pk), col("__ck") === col("__pk"), "left")
      .agg(count(lit(1)).as("n_checked"),
        count(when(col("__pk").isNull, 1)).as("n_violations"))
      .select(lit(checkName).as("check_name"), col("n_checked"), col("n_violations"))
  }

  /** N referential checks against ONE scan of the child — the shape that
    * matters when the child is the fact table: project all checked keys,
    * broadcast-probe every parent key set in the same pass, and stack the
    * per-check counters out of a single aggregate row. At 100 TB the
    * dimension scans are noise but the fact table must be read once, not
    * once per FK. Specs: (checkName, childKey, parent, parentKey). */
  def referentialAll(child: DataFrame,
                     specs: Seq[(String, String, DataFrame, String)]): DataFrame = {
    require(specs.nonEmpty, "referentialAll: need at least one check")
    val projected = child.select(specs.map(_._2).distinct.map(col): _*)
    val joined = specs.zipWithIndex.foldLeft(projected) { case (df, ((_, ck, parent, pk), i)) =>
      df.join(broadcast(parent.select(col(pk).as(s"__pk_$i")).distinct()),
        col(ck) === col(s"__pk_$i"), "left")
    }
    val counters = specs.indices.map(i =>
      count(when(col(s"__pk_$i").isNull, 1)).as(s"__viol_$i"))
    val one = joined.agg(count(lit(1)).as("__n"), counters: _*)
    val stackArgs = specs.zipWithIndex.flatMap { case ((name, _, _, _), i) =>
      Seq(lit(name), col(s"__viol_$i"))
    }
    one.select(col("__n"),
        stack((Seq(lit(specs.size)) ++ stackArgs): _*).as(Seq("check_name", "n_violations")))
      .select(col("check_name"), col("__n").as("n_checked"), col("n_violations"))
  }

  /** Union a report from individual checks (each side is one summary
    * row; the union is scan-parallel — Spark runs the legs as
    * independent stages). */
  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_.unionByName(_))
}
