package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.F

/** SURVEY.md §2.A (continued) — the reference's table-maintenance
  * semantics: upsert-with-status (srm_tools/update_table.py
  * airtable_updater_flow) and field-level manual fixes
  * (operators/derive/manual_fixes.py). The "fetched" side is derived
  * deterministically from the test tables so the oracle can reproduce it.
  */
object UpdateQueries {

  val defs: Map[String, QueryDef] = Map(

    // q36: upsert flow (update_table.py:56): current FULL OUTER JOIN
    // fetched on the row id; rows present in fetched become ACTIVE with
    // merged fields, rows only in current go INACTIVE; a row hash detects
    // real changes (test_hash) so unchanged rows can be skipped downstream.
    "q36_upsert" -> QueryDef.of(
      """WITH current AS (
        |  SELECT c_custkey AS id, c_name AS name, CAST(c_acctbal AS DECIMAL(18,2)) AS balance
        |  FROM customer
        |), fetched AS (
        |  SELECT o_custkey AS id,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS balance
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        |  GROUP BY o_custkey
        |)
        |SELECT coalesce(c.id, f.id) AS id,
        |  c.name AS name,
        |  CAST(coalesce(f.balance, c.balance) AS DOUBLE) AS balance,
        |  CASE WHEN f.id IS NOT NULL THEN 'ACTIVE' ELSE 'INACTIVE' END AS status,
        |  (c.id IS NOT NULL AND f.id IS NOT NULL AND f.balance <> c.balance) AS changed
        |FROM current c FULL OUTER JOIN fetched f ON c.id = f.id
        |""".stripMargin) { (s, dir) =>
      val current = Tables.customer(s, dir).select(
        col("c_custkey").as("c_id"), col("c_name").as("name"), F.money(col("c_acctbal")).as("c_balance"))
      val fetched = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .groupBy(col("o_custkey").as("f_id"))
        .agg(sum(F.money(col("o_totalprice"))).cast("decimal(18,2)").as("f_balance"))
      current.join(fetched, col("c_id") === col("f_id"), "full_outer")
        .select(
          coalesce(col("c_id"), col("f_id")).as("id"),
          col("name"),
          coalesce(col("f_balance"), col("c_balance")).cast("double").as("balance"),
          when(col("f_id").isNotNull, "ACTIVE").otherwise("INACTIVE").as("status"),
          (col("c_id").isNotNull && col("f_id").isNotNull && col("f_balance") =!= col("c_balance")).as("changed"))
    },

    // q37: manual fixes (manual_fixes.py): a (record, field, value) patch
    // table applied over the base — left join + per-field coalesce, with a
    // used/unused accounting flag (the reference tracks fix usage).
    "q37_manual_fixes" -> QueryDef.of(
      """WITH fixes AS (
        |  SELECT c_custkey AS fix_id, upper(c_name) AS new_name
        |  FROM customer WHERE c_custkey % 100 = 0
        |)
        |SELECT c_custkey AS custkey,
        |  coalesce(f.new_name, c_name) AS name,
        |  (f.fix_id IS NOT NULL) AS was_fixed
        |FROM customer c LEFT JOIN fixes f ON c.c_custkey = f.fix_id
        |""".stripMargin) { (s, dir) =>
      val customers = Tables.customer(s, dir)
      val fixes = customers.filter(col("c_custkey") % 100 === 0)
        .select(col("c_custkey").as("fix_id"), upper(col("c_name")).as("new_name"))
      customers.join(broadcast(fixes), col("c_custkey") === col("fix_id"), "left")
        .select(
          col("c_custkey").as("custkey"),
          coalesce(col("new_name"), col("c_name")).as("name"),
          col("fix_id").isNotNull.as("was_fixed"))
    },

    // q122: row-validity gate (utilities/update.py:3 filter_valid_rows) —
    // keep rows where at least one watched field is usable, before an
    // update batch ships. Faithful to the reference's CODE, which
    // invalidates exactly NULL, float NaN, and trim-lower == 'none'
    // (its docstring also claims empty strings, but the code keeps them
    // — the code is the behavior we re-express). The dirty batch is
    // derived deterministically from `customer` (hash-mod field
    // corruption) so the oracle reproduces it; the filter itself is one
    // codegen'd boolean over the row — map-side, zero shuffles at any
    // scale. Per-field validity flags ride out for the update
    // accounting the reference logs.
    "q122_valid_rows" -> QueryDef.of(
      """WITH dirtied AS (
        |  SELECT c_custkey AS id,
        |    CASE WHEN c_custkey % 5 = 0 THEN 'None' ELSE c_mktsegment END AS segment,
        |    CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END AS name,
        |    CASE WHEN c_custkey % 11 = 0 THEN CAST('NaN' AS DOUBLE)
        |         ELSE CAST(c_acctbal AS DOUBLE) END AS bal
        |  FROM customer
        |), flagged AS (
        |  SELECT id,
        |    (segment IS NOT NULL AND lower(trim(segment)) <> 'none') AS segment_valid,
        |    (name IS NOT NULL AND lower(trim(name)) <> 'none') AS name_valid,
        |    (bal IS NOT NULL AND NOT isnan(bal)) AS bal_valid
        |  FROM dirtied
        |)
        |SELECT id, segment_valid, name_valid, bal_valid
        |FROM flagged WHERE segment_valid OR name_valid OR bal_valid
        |""".stripMargin) { (s, dir) =>
      def strValid(c: org.apache.spark.sql.Column) =
        c.isNotNull && lower(trim(c)) =!= "none"
      val dirtied = Tables.customer(s, dir).select(
        col("c_custkey").as("id"),
        when(col("c_custkey") % 5 === 0, "None").otherwise(col("c_mktsegment")).as("segment"),
        when(col("c_custkey") % 3 === 0, lit(null)).otherwise(col("c_name")).as("name"),
        when(col("c_custkey") % 11 === 0, lit(Double.NaN))
          .otherwise(col("c_acctbal").cast("double")).as("bal"))
      dirtied.select(
        col("id"),
        strValid(col("segment")).as("segment_valid"),
        strValid(col("name")).as("name_valid"),
        (col("bal").isNotNull && !isnan(col("bal"))).as("bal_valid"))
        .filter(col("segment_valid") || col("name_valid") || col("bal_valid"))
    }
  )
}
