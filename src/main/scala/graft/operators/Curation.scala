package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curation-base merge (SURVEY.md §2 — from_curation.py:47
  * `copy_from_curation_base` + mde_utils.py): pull rows from a curation
  * table through the reference's gate chain, default missing decisions to
  * 'New', copy a field SUBSET keyed by id into the destination table, and
  * classify each copied row as UPDATE (id already present) or CREATE.
  * The reference's driver-side `collect_ids` dict becomes the join itself
  * — fully distributed.
  */
object Curation {

  /** @param curation  source rows (one per curated entity)
    * @param current   destination table (the updater's existing rows)
    * @param idCol     entity id column name (both sides)
    * @param fields    the field subset to copy (from_curation.py:52
    *                  table_fields — everything else is dropped)
    * @param statusOk  gate: status == ACTIVE (from_curation.py:104)
    * @param decisionCol decision column; Rejected/Suspended rows are
    *                  dropped, nulls become 'New' (from_curation.py:83)
    * @param hasServices gate: entity has any services (from_curation.py:108)
    */
  def copyFromCuration(curation: DataFrame, current: DataFrame, idCol: String,
                       fields: Seq[String], statusOk: Column, decisionCol: Column,
                       hasServices: Column): DataFrame = {
    val gated = curation
      .filter(statusOk)
      .filter(!coalesce(decisionCol, lit("New")).isin("Rejected", "Suspended"))
      .filter(hasServices)
      .withColumn("decision", coalesce(decisionCol, lit("New")))
    val subset = gated.select((idCol +: fields).map(col) :+ col("decision"): _*)
    // Join strategy intentionally left to Catalyst/AQE: the destination id
    // set is broadcast when small, shuffle-joined when it isn't.
    val cur = current.select(col(idCol).as("cur_id")).distinct()
    subset
      .join(cur, col(idCol) === col("cur_id"), "left")
      .withColumn("operation", when(col("cur_id").isNotNull, "UPDATE").otherwise("CREATE"))
      .drop("cur_id")
  }
}
