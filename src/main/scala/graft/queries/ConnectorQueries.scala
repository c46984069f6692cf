package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.{GeoProjection, Olc}

/** SURVEY.md §2.A (continued) — the reference's per-source CONNECTOR
  * operators: the transform halves of the data-source flows under
  * `operators/` that are not part of the main derive pipeline
  * (entities, day_care, geocode). The API/Airtable extraction halves
  * stay out of scope (zero egress); everything below re-expresses the
  * row logic those flows run AFTER fetch, on deterministic synthetic
  * stand-ins derived from the test tables.
  */
object ConnectorQueries {

  // Shared reference literals (operators/entities/__init__.py,
  // operators/geocode/__init__.py, operators/day_care/
  // match_organizations.py). Hebrew strings are data constants from the
  // reference, interpolated identically into both engines.
  private val PoBox = " תאי דואר" // calc_address city cleanup
  private val NoAddress = "ללא כתובת" // calc_address alternate sentinel
  private val IritShort = "עירית " // normalize_hebrew: single-yod spelling
  private val IritFull = "עיריית " // -> double-yod spelling
  private val PrefIriya = "עיריית"
  private val PrefMoatzaM = "מועצה מקומית"
  private val PrefMoatzaA = "מועצה אזורית"

  val defs: Map[String, QueryDef] = Map(

    // q137: branch location keys (operators/entities/__init__.py:253
    // calc_address + :276 calc_location_key): compose the address key
    // (street + house + ', ' + cleaned city, alternate-address appended
    // only when it is not already a substring and not the 'no address'
    // sentinel), and the OLC length-11 plus code when coordinates exist —
    // the plus code wins, the address is the fallback. Plan: map-only,
    // zero shuffles at any scale; the OLC digit peel is pure integer
    // div/mod inside whole-stage codegen (operators/Olc.scala), replayed
    // digit-for-digit by the oracle. Float literals are e-notation in the
    // SQL so DuckDB computes the same DOUBLE tree as the JVM (its plain
    // decimal literals are exact DECIMALs — a different number line).
    "q137_location_keys" -> QueryDef.of(
      s"""WITH s0 AS (
         |  SELECT s_suppkey AS branch_id,
         |    (s_suppkey % 7 <> 0) AS has_coords,
         |    29.45e0 + (s_suppkey % 397) * 1.1e-2 AS blat,
         |    34.27e0 + ((s_suppkey * 7 + s_nationkey) % 211) * 8e-3 AS blng,
         |    CASE WHEN s_suppkey % 11 <> 0 THEN 'City ' || CAST(s_nationkey % 25 AS VARCHAR) || (CASE WHEN s_suppkey % 5 = 0 THEN '$PoBox' ELSE '' END) END AS city_raw,
         |    CASE WHEN s_suppkey % 3 <> 0 THEN 'Main ' || CAST(s_suppkey % 50 AS VARCHAR) END AS street,
         |    CASE WHEN s_suppkey % 4 <> 0 THEN CAST(s_suppkey % 120 AS VARCHAR) END AS house,
         |    CASE s_suppkey % 6 WHEN 0 THEN '$NoAddress' WHEN 1 THEN NULL WHEN 2 THEN 'City ' || CAST(s_nationkey % 25 AS VARCHAR) ELSE 'Wing ' || CAST(s_suppkey % 4 AS VARCHAR) END AS alt
         |  FROM supplier),
         |a1 AS (
         |  SELECT *, CASE WHEN city_raw IS NOT NULL THEN
         |      (CASE WHEN street IS NOT NULL THEN street || ' ' || COALESCE(house || ' ', '') || ', ' ELSE '' END)
         |      || replace(city_raw, '$PoBox', '') || ' '
         |    ELSE '' END AS base FROM s0),
         |a2 AS (
         |  SELECT *, NULLIF(trim(base || (CASE WHEN alt IS NOT NULL AND alt <> '$NoAddress' AND instr(base, alt) = 0 THEN ' - ' || alt ELSE '' END)), '') AS address FROM a1),
         |a3 AS (
         |  SELECT *, CASE WHEN has_coords THEN ${Olc.Sql.encode11("blat", "blng")} END AS plus_code FROM a2)
         |SELECT branch_id, address, plus_code,
         |  COALESCE(plus_code, address) AS location_key
         |FROM a3
         |""".stripMargin) { (s, dir) =>
      val k = col("s_suppkey")
      val s0 = Tables.supplier(s, dir).select(
        k.as("branch_id"),
        (k % 7 =!= 0).as("has_coords"),
        (lit(29.45) + (k % 397).cast("double") * lit(0.011)).as("blat"),
        (lit(34.27) + ((k * 7 + col("s_nationkey")) % 211).cast("double") * lit(0.008)).as("blng"),
        when(k % 11 =!= 0,
          concat(lit("City "), (col("s_nationkey") % 25).cast("string"),
            when(k % 5 === 0, lit(PoBox)).otherwise(lit("")))).as("city_raw"),
        when(k % 3 =!= 0, concat(lit("Main "), (k % 50).cast("string"))).as("street"),
        when(k % 4 =!= 0, (k % 120).cast("string")).as("house"),
        when(k % 6 === 0, lit(NoAddress))
          .when(k % 6 === 1, lit(null).cast("string"))
          .when(k % 6 === 2, concat(lit("City "), (col("s_nationkey") % 25).cast("string")))
          .otherwise(concat(lit("Wing "), (k % 4).cast("string"))).as("alt"))
      val base = when(col("city_raw").isNotNull,
        concat(
          when(col("street").isNotNull,
            concat(col("street"), lit(" "),
              coalesce(concat(col("house"), lit(" ")), lit("")), lit(", ")))
            .otherwise(lit("")),
          replace(col("city_raw"), lit(PoBox), lit("")), lit(" ")))
        .otherwise(lit(""))
      val a1 = s0.withColumn("base", base)
      val addr = nullif(trim(concat(col("base"),
        when(col("alt").isNotNull && col("alt") =!= NoAddress &&
          !col("base").contains(col("alt")), concat(lit(" - "), col("alt")))
          .otherwise(lit("")))), lit(""))
      a1.withColumn("address", addr)
        .withColumn("plus_code",
          when(col("has_coords"), Olc.encode11(col("blat"), col("blng"))))
        .select(col("branch_id"), col("address"), col("plus_code"),
          coalesce(col("plus_code"), col("address")).as("location_key"))
    },

    // q138: organization matching by spelling variants (operators/
    // day_care/match_organizations.py:4): normalize the single-yod
    // 'עירית' spelling on BOTH sides, try a direct lookup, and — only
    // for names carrying one of the three municipal prefixes — retry
    // with the city part's hyphens and spaces swapped. A found id
    // OVERRIDES the row's existing organization_id (combine_first), and
    // the registration number takes any id that is not the literal '0'.
    // Plan: the lookup is a 25-row broadcast dimension joined twice
    // (direct key, variant key) — map-side only, zero shuffles; the
    // variant candidate is computed per row in codegen, never exploded.
    "q138_org_variant_match" -> QueryDef.of(
      s"""WITH lookup AS (
         |  SELECT 'rec' || lpad(CAST(n_nationkey AS VARCHAR), 3, '0') AS row_id,
         |    replace(trim(split_part(
         |      (CASE WHEN n_nationkey % 2 = 0 AND n_nationkey % 5 = 0 THEN '$IritShort' ELSE (CASE WHEN n_nationkey % 2 = 0 THEN '$PrefIriya ' ELSE '$PrefMoatzaM ' END) END)
         |      || (CASE WHEN n_nationkey % 3 = 0 THEN 'City-' || CAST(n_nationkey AS VARCHAR) ELSE 'City ' || CAST(n_nationkey AS VARCHAR) END)
         |      || (CASE WHEN n_nationkey % 6 = 0 THEN ' ' ELSE '' END)
         |      || (CASE WHEN n_nationkey % 4 = 0 THEN '|ignored' ELSE '' END), '|', 1)), '$IritShort', '$IritFull') AS norm_name
         |  FROM nation),
         |fetched AS (
         |  SELECT c_custkey AS custkey, c_custkey % 25 AS c,
         |    CASE WHEN c_custkey % 2 = 0 THEN 'orig-' || CAST(c_custkey AS VARCHAR) WHEN c_custkey % 10 = 5 THEN '0' END AS existing_org,
         |    CASE WHEN c_custkey % 5 = 2 THEN 'hp-' || CAST(c_custkey AS VARCHAR) END AS existing_hp
         |  FROM customer),
         |named AS (
         |  SELECT *, CASE
         |      WHEN custkey % 7 = 0 THEN NULL
         |      WHEN custkey % 11 = 0 THEN 'Center City ' || CAST(c AS VARCHAR)
         |      WHEN custkey % 3 = 0 THEN
         |        (CASE WHEN c % 2 = 0 AND c % 5 = 0 THEN '$IritShort' ELSE (CASE WHEN c % 2 = 0 THEN '$PrefIriya ' ELSE '$PrefMoatzaM ' END) END)
         |        || (CASE WHEN c % 3 = 0 THEN 'City-' || CAST(c AS VARCHAR) ELSE 'City ' || CAST(c AS VARCHAR) END)
         |      WHEN custkey % 3 = 1 THEN
         |        (CASE WHEN c % 2 = 0 THEN '$PrefIriya ' ELSE '$PrefMoatzaM ' END)
         |        || (CASE WHEN c % 3 = 0 THEN 'City ' || CAST(c AS VARCHAR) ELSE 'City-' || CAST(c AS VARCHAR) END)
         |      ELSE 'Org ' || CAST(custkey AS VARCHAR) END AS org_name0
         |  FROM fetched),
         |padded AS (
         |  SELECT custkey, existing_org, existing_hp,
         |    CASE WHEN org_name0 IS NULL THEN NULL WHEN custkey % 13 = 0 THEN ' ' || org_name0 || ' ' ELSE org_name0 END AS org_name
         |  FROM named),
         |cleaned AS (
         |  SELECT *, replace(trim(org_name), '$IritShort', '$IritFull') AS clean FROM padded),
         |prefixed AS (
         |  SELECT *, CASE
         |      WHEN starts_with(clean, '$PrefMoatzaM') THEN '$PrefMoatzaM'
         |      WHEN starts_with(clean, '$PrefMoatzaA') THEN '$PrefMoatzaA'
         |      WHEN starts_with(clean, '$PrefIriya') THEN '$PrefIriya' END AS pref
         |  FROM cleaned),
         |cand AS (
         |  SELECT *, CASE WHEN pref IS NOT NULL THEN
         |      (CASE WHEN instr(trim(substr(clean, length(pref) + 1)), '-') > 0 THEN pref || ' ' || replace(trim(substr(clean, length(pref) + 1)), '-', ' ')
         |            WHEN instr(trim(substr(clean, length(pref) + 1)), ' ') > 0 THEN pref || ' ' || replace(trim(substr(clean, length(pref) + 1)), ' ', '-') END)
         |    END AS candidate
         |  FROM prefixed)
         |SELECT f.custkey, f.org_name,
         |  COALESCE(d.row_id, v.row_id, f.existing_org) AS organization_id,
         |  COALESCE(NULLIF(COALESCE(d.row_id, v.row_id, f.existing_org), '0'), f.existing_hp) AS org_reg,
         |  (COALESCE(d.row_id, v.row_id) IS NOT NULL) AS matched
         |FROM cand f
         |LEFT JOIN lookup d ON f.clean = d.norm_name
         |LEFT JOIN lookup v ON f.candidate = v.norm_name
         |""".stripMargin) { (s, dir) =>
      val n = col("n_nationkey")
      val lookup = Tables.nation(s, dir).select(
        concat(lit("rec"), lpad(n.cast("string"), 3, "0")).as("row_id"),
        replace(trim(element_at(split(concat(
          when(n % 2 === 0 && n % 5 === 0, lit(IritShort))
            .otherwise(when(n % 2 === 0, lit(PrefIriya + " ")).otherwise(lit(PrefMoatzaM + " "))),
          when(n % 3 === 0, concat(lit("City-"), n.cast("string")))
            .otherwise(concat(lit("City "), n.cast("string"))),
          when(n % 6 === 0, lit(" ")).otherwise(lit("")),
          when(n % 4 === 0, lit("|ignored")).otherwise(lit(""))), "\\|"), 1)),
          lit(IritShort), lit(IritFull)).as("norm_name"))
      val k = col("c_custkey")
      val c = (k % 25).as("c")
      val fetched = Tables.customer(s, dir).select(
        k.as("custkey"), c,
        when(k % 2 === 0, concat(lit("orig-"), k.cast("string")))
          .when(k % 10 === 5, lit("0")).as("existing_org"),
        when(k % 5 === 2, concat(lit("hp-"), k.cast("string"))).as("existing_hp"))
      val cc = col("c")
      val prefNorm = when(cc % 2 === 0, lit(PrefIriya + " ")).otherwise(lit(PrefMoatzaM + " "))
      val orgName0 =
        when(col("custkey") % 7 === 0, lit(null).cast("string"))
          .when(col("custkey") % 11 === 0, concat(lit("Center City "), cc.cast("string")))
          .when(col("custkey") % 3 === 0, concat(
            when(cc % 2 === 0 && cc % 5 === 0, lit(IritShort)).otherwise(prefNorm),
            when(cc % 3 === 0, concat(lit("City-"), cc.cast("string")))
              .otherwise(concat(lit("City "), cc.cast("string")))))
          .when(col("custkey") % 3 === 1, concat(
            prefNorm,
            when(cc % 3 === 0, concat(lit("City "), cc.cast("string")))
              .otherwise(concat(lit("City-"), cc.cast("string")))))
          .otherwise(concat(lit("Org "), col("custkey").cast("string")))
      val named = fetched.withColumn("org_name0", orgName0)
        .withColumn("org_name",
          when(col("org_name0").isNull, lit(null).cast("string"))
            .when(col("custkey") % 13 === 0, concat(lit(" "), col("org_name0"), lit(" ")))
            .otherwise(col("org_name0")))
        .withColumn("clean", replace(trim(col("org_name")), lit(IritShort), lit(IritFull)))
        .withColumn("pref",
          when(col("clean").startsWith(PrefMoatzaM), lit(PrefMoatzaM))
            .when(col("clean").startsWith(PrefMoatzaA), lit(PrefMoatzaA))
            .when(col("clean").startsWith(PrefIriya), lit(PrefIriya)))
      val cityPart = trim(col("clean").substr(length(col("pref")) + 1, length(col("clean"))))
      val withCand = named.withColumn("candidate",
        when(col("pref").isNotNull,
          when(cityPart.contains("-"), concat(col("pref"), lit(" "), replace(cityPart, lit("-"), lit(" "))))
            .when(cityPart.contains(" "), concat(col("pref"), lit(" "), replace(cityPart, lit(" "), lit("-"))))))
      val d = lookup.withColumnRenamed("row_id", "id_d").withColumnRenamed("norm_name", "nm_d")
      val v = lookup.withColumnRenamed("row_id", "id_v").withColumnRenamed("norm_name", "nm_v")
      val matchedId = coalesce(col("id_d"), col("id_v"))
      val orgId = coalesce(matchedId, col("existing_org"))
      withCand
        .join(broadcast(d), col("clean") === col("nm_d"), "left")
        .join(broadcast(v), col("candidate") === col("nm_v"), "left")
        .select(col("custkey"), col("org_name"),
          orgId.as("organization_id"),
          coalesce(nullif(orgId, lit("0")), col("existing_hp")).as("org_reg"),
          matchedId.isNotNull.as("matched"))
    }
  )
}
