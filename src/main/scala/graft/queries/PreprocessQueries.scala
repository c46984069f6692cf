package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.F

/** SURVEY.md §2 — the reference's per-entity `preprocess_*` staging chains
  * (operators/derive/helpers.py:124-270): dummy-row filter, active-status
  * gate, staging surrogate key, and the per-entity field transforms
  * (manual-value overrides, url/phone structuring, whitespace cleanup,
  * boost default), composed from the library kernels that q08/q39/q49/q51
  * verify individually. Three entity chains (organizations ← customer,
  * services ← part, branches ← orders) unify to one staging schema, the
  * same shape srm-etl's staging DB sees after preprocessing.
  *
  * Raw Airtable-ish values (status text, manual overrides, newline-packed
  * urls/phones) derive deterministically from the entity columns so every
  * transform branch executes — the q49/q51 pattern.
  */
object PreprocessQueries {

  /** remove_whitespaces SQL twin (helpers.py:377). */
  private def cleanSql(e: String) =
    s"regexp_replace(regexp_replace($e, '\\s+', ' ', 'g'), '^[ \\t\\n(-]+|[ \\t\\n(-]+$$', '', 'g')"

  /** One transform_urls entry (helpers.py:23) serialized as href^title —
    * the SCALAR form of [[F.transformUrls]]: the last '#' splits an
    * optional title, default "קישור". Array HOFs are CodegenFallback
    * (SURVEY §6 lesson 1), so the per-entry hot path runs these codegen'd
    * string ops instead; q51/PropertySpec keep the array kernel honest. */
  private def urlEntry(raw: org.apache.spark.sql.Column) = concat(
    when(raw.contains("#"), regexp_replace(raw, "#[^#]*$", "")).otherwise(raw),
    lit("^"),
    when(raw.contains("#"), regexp_extract(raw, "#([^#]*)$", 1)).otherwise(lit("קישור")))

  private def orgs(s: SparkSession, dir: String): DataFrame = {
    val nameRaw =
      when(col("c_custkey") % 97 === 0, "dummy")
        .when(col("c_custkey") % 89 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("  "), col("c_name"),
          when(col("c_custkey") % 7 === 0, " -").otherwise("")))
    val status =
      when(col("c_custkey") % 10 === 0, "inactive")
        .when(col("c_custkey") % 10 === 1, " active ")
        .otherwise("ACTIVE")
    // two raw entries: one '#'-titled, one bare (title defaults)
    val urlsJoined = concat(
      urlEntry(concat(lit("https://org.example/"), col("c_custkey").cast("string"), lit("#אתר"))),
      lit("|"),
      urlEntry(concat(lit("www.example-"), (col("c_custkey") % 50).cast("string"), lit(".org"))))
    val phonesRaw = concat(
      lit("05"), (col("c_custkey") % 4).cast("string"), lit("-"),
      lpad((col("c_custkey") % 10000000).cast("string"), 7, "0"))
    Tables.customer(s, dir)
      .withColumn("name_raw", nameRaw)
      // filter_dummy_data then filter_active_data (helpers.py:85,89), then
      // the organizations-only "No Name" gate (helpers.py:183)
      .filter(coalesce(col("name_raw"), lit("")) =!= "dummy")
      .filter(upper(trim(status)) === "ACTIVE")
      .filter(col("name_raw").isNotNull && col("name_raw") =!= "")
      .select(
        lit("organizations").as("entity"),
        F.hashKey(lit("organizations"), col("c_custkey")).as("key"),
        col("c_custkey").as("id"),
        F.cleanWhitespace(col("name_raw")).as("name"),
        F.cleanWhitespace(
          when(col("c_custkey") % 3 === 0,
            concat(lit("Org "), (col("c_custkey") % 100).cast("string"), lit(" ")))
        ).as("short_name"),
        array_join(F.formatPhoneNumbers(phonesRaw), "|").as("phone_numbers"),
        urlsJoined.as("urls"),
        lit(null).cast("string").as("situation_ids"),
        lit(null).cast("string").as("data_sources"),
        lit(null).cast("double").as("boost"))
  }

  private def services(s: SparkSession, dir: String): DataFrame = {
    val nameRaw = when(col("p_partkey") % 101 === 0, "dummy").otherwise(col("p_name"))
    val nameManual =
      when(col("p_partkey") % 5 === 0, concat(lit("MANUAL "), col("p_name")))
    val status = when(col("p_partkey") % 8 === 0, "retired").otherwise(" Active")
    val sitManual =
      when(col("p_partkey") % 4 === 0,
        concat(lit("human_situations:manual:"), (col("p_partkey") % 5).cast("string")))
    val sitBase = concat(lit("sit:"), regexp_replace(lower(col("p_type")), " ", "_"))
    val boostRaw =
      when(col("p_partkey") % 7 === 0, lit(null).cast("double"))
        .otherwise((col("p_partkey") % 10).cast("double"))
    Tables.part(s, dir)
      .withColumn("name_raw", nameRaw)
      .filter(col("name_raw") =!= "dummy")
      .filter(upper(trim(status)) === "ACTIVE")
      .select(
        lit("services").as("entity"),
        F.hashKey(lit("services"), col("p_partkey")).as("key"),
        col("p_partkey").as("id"),
        // name_manual or name (helpers.py:155)
        coalesce(nameManual, col("name_raw")).as("name"),
        lit(null).cast("string").as("short_name"),
        lit(null).cast("string").as("phone_numbers"),
        lit(null).cast("string").as("urls"),
        // situations_manual_ids or situation_ids (helpers.py:156)
        coalesce(sitManual, sitBase).as("situation_ids"),
        // data_sources: newline split (helpers.py:165)
        array_join(split(concat(lit("catalog\n"), col("p_brand")), "\n"), "|")
          .as("data_sources"),
        // boost: v or 0 (helpers.py:158)
        coalesce(boostRaw, lit(0.0)).as("boost"))
  }

  private def branches(s: SparkSession, dir: String): DataFrame = {
    val nameRaw =
      when(col("o_orderkey") % 997 === 0, "dummy")
        .otherwise(concat(lit("  Branch "), col("o_orderpriority"),
          when(col("o_orderkey") % 5 === 0, " (").otherwise("")))
    val status =
      when(col("o_orderstatus") === "O", "Active")
        .when(col("o_orderstatus") === "F", " ACTIVE ")
        .otherwise("pending")
    val phonesRaw = concat(lit("02"), lpad((col("o_orderkey") % 10000000).cast("string"), 7, "0"))
    // single bare entry — title defaults through the same scalar path
    val urlsRaw = urlEntry(concat(lit("branch.example/"), (col("o_orderkey") % 1000).cast("string")))
    Tables.orders(s, dir)
      .withColumn("name_raw", nameRaw)
      .filter(col("name_raw") =!= "dummy")
      .filter(upper(trim(status)) === "ACTIVE")
      .select(
        lit("branches").as("entity"),
        F.hashKey(lit("branches"), col("o_orderkey")).as("key"),
        col("o_orderkey").as("id"),
        F.cleanWhitespace(col("name_raw")).as("name"),
        lit(null).cast("string").as("short_name"),
        array_join(F.formatPhoneNumbers(phonesRaw), "|").as("phone_numbers"),
        urlsRaw.as("urls"),
        lit(null).cast("string").as("situation_ids"),
        lit(null).cast("string").as("data_sources"),
        lit(null).cast("double").as("boost"))
  }

  val defs: Map[String, QueryDef] = Map(

    // q68: the preprocess_* staging union. Each chain is narrow per-row
    // work with no shuffle at all — the union of three file scans keeps
    // every stage in whole-stage codegen, the shape that scales linearly
    // with input splits.
    "q68_preprocess" -> QueryDef.of(
      s"""WITH orgs AS (
        |  SELECT 'organizations' AS entity,
        |    substr(md5('organizations' || CAST(c_custkey AS VARCHAR)), 1, 8) AS key,
        |    c_custkey AS id,
        |    ${cleanSql("name_raw")} AS name,
        |    CASE WHEN c_custkey % 3 = 0 THEN ${cleanSql("'Org ' || CAST(c_custkey % 100 AS VARCHAR) || ' '")} END AS short_name,
        |    substr(digits, 1, 3) || '-' || substr(digits, 4, 3) || '-' || substr(digits, 7, 4) AS phone_numbers,
        |    'https://org.example/' || CAST(c_custkey AS VARCHAR) || '^אתר'
        |      || '|' || 'www.example-' || CAST(c_custkey % 50 AS VARCHAR) || '.org^קישור' AS urls,
        |    CAST(NULL AS VARCHAR) AS situation_ids,
        |    CAST(NULL AS VARCHAR) AS data_sources,
        |    CAST(NULL AS DOUBLE) AS boost
        |  FROM (
        |    SELECT *,
        |      CASE WHEN c_custkey % 97 = 0 THEN 'dummy'
        |           WHEN c_custkey % 89 = 0 THEN NULL
        |           ELSE '  ' || c_name || CASE WHEN c_custkey % 7 = 0 THEN ' -' ELSE '' END END AS name_raw,
        |      '05' || CAST(c_custkey % 4 AS VARCHAR) || lpad(CAST(c_custkey % 10000000 AS VARCHAR), 7, '0') AS digits,
        |      CASE WHEN c_custkey % 10 = 0 THEN 'inactive'
        |           WHEN c_custkey % 10 = 1 THEN ' active ' ELSE 'ACTIVE' END AS status
        |    FROM customer
        |  ) WHERE coalesce(name_raw, '') <> 'dummy'
        |      AND upper(trim(status)) = 'ACTIVE'
        |      AND name_raw IS NOT NULL AND name_raw <> ''
        |), svcs AS (
        |  SELECT 'services' AS entity,
        |    substr(md5('services' || CAST(p_partkey AS VARCHAR)), 1, 8) AS key,
        |    p_partkey AS id,
        |    CASE WHEN p_partkey % 5 = 0 THEN 'MANUAL ' || p_name ELSE name_raw END AS name,
        |    CAST(NULL AS VARCHAR) AS short_name,
        |    CAST(NULL AS VARCHAR) AS phone_numbers,
        |    CAST(NULL AS VARCHAR) AS urls,
        |    CASE WHEN p_partkey % 4 = 0 THEN 'human_situations:manual:' || CAST(p_partkey % 5 AS VARCHAR)
        |         ELSE 'sit:' || replace(lower(p_type), ' ', '_') END AS situation_ids,
        |    'catalog|' || p_brand AS data_sources,
        |    CASE WHEN p_partkey % 7 = 0 THEN 0.0 ELSE CAST(p_partkey % 10 AS DOUBLE) END AS boost
        |  FROM (
        |    SELECT *, CASE WHEN p_partkey % 101 = 0 THEN 'dummy' ELSE p_name END AS name_raw,
        |      CASE WHEN p_partkey % 8 = 0 THEN 'retired' ELSE ' Active' END AS status
        |    FROM part
        |  ) WHERE name_raw <> 'dummy' AND upper(trim(status)) = 'ACTIVE'
        |), brs AS (
        |  SELECT 'branches' AS entity,
        |    substr(md5('branches' || CAST(o_orderkey AS VARCHAR)), 1, 8) AS key,
        |    o_orderkey AS id,
        |    ${cleanSql("name_raw")} AS name,
        |    CAST(NULL AS VARCHAR) AS short_name,
        |    substr(digits, 1, 2) || '-' || substr(digits, 3, 3) || '-' || substr(digits, 6, 4) AS phone_numbers,
        |    'branch.example/' || CAST(o_orderkey % 1000 AS VARCHAR) || '^קישור' AS urls,
        |    CAST(NULL AS VARCHAR) AS situation_ids,
        |    CAST(NULL AS VARCHAR) AS data_sources,
        |    CAST(NULL AS DOUBLE) AS boost
        |  FROM (
        |    SELECT *,
        |      CASE WHEN o_orderkey % 997 = 0 THEN 'dummy'
        |           ELSE '  Branch ' || o_orderpriority || CASE WHEN o_orderkey % 5 = 0 THEN ' (' ELSE '' END END AS name_raw,
        |      '02' || lpad(CAST(o_orderkey % 10000000 AS VARCHAR), 7, '0') AS digits,
        |      CASE WHEN o_orderstatus = 'O' THEN 'Active'
        |           WHEN o_orderstatus = 'F' THEN ' ACTIVE ' ELSE 'pending' END AS status
        |    FROM orders
        |  ) WHERE name_raw <> 'dummy' AND upper(trim(status)) = 'ACTIVE'
        |)
        |SELECT * FROM orgs UNION ALL SELECT * FROM svcs UNION ALL SELECT * FROM brs
        |""".stripMargin) { (s, dir) =>
      orgs(s, dir).unionByName(services(s, dir)).unionByName(branches(s, dir))
    }
  )
}
