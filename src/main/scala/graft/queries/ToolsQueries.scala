package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** SURVEY.md §2 — remaining srm_tools kernels: age-range situation
  * bucketing (situations.py:41-60) and URL fixing/structuring
  * (url_utils.py:6 `fix_url`, helpers.py:23 `transform_urls`).
  */
object ToolsQueries {

  private val DomainRe = "(?i)^[a-z0-9][a-z0-9\\-\\.]{0,61}[a-z0-9]\\.[a-z]{2,}$"

  val defs: Map[String, QueryDef] = Map(

    // q50: situations_for_age_range — overlap tests against the six age
    // bands IN THE REFERENCE'S APPEND ORDER, null ages defaulting to
    // 0/120, and the all-six-match -> empty rule. Ages derive from
    // customer columns (nulls injected to exercise the defaults).
    "q50_age_situations" -> QueryDef.of(
      """WITH src AS (
        |  SELECT c_custkey AS custkey,
        |    CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE c_custkey % 60 END AS min_age_raw,
        |    CASE WHEN c_custkey % 17 = 0 THEN NULL ELSE (c_custkey % 60) + (c_nationkey % 40) END AS max_age_raw
        |  FROM customer
        |), ages AS (
        |  SELECT custkey, coalesce(min_age_raw, 0) AS lo, coalesce(max_age_raw, 120) AS hi FROM src
        |), bands AS (
        |  SELECT custkey,
        |    list_filter([
        |      CASE WHEN lo <= 54 AND hi >= 31 THEN 'adults' END,
        |      CASE WHEN lo <= 30 AND hi >= 20 THEN 'young_adults' END,
        |      CASE WHEN lo <= 19 AND hi >= 13 THEN 'teens' END,
        |      CASE WHEN lo <= 1 AND hi >= 0 THEN 'infants' END,
        |      CASE WHEN lo <= 12 AND hi >= 2 THEN 'children' END,
        |      CASE WHEN hi >= 55 THEN 'seniors' END
        |    ], x -> x IS NOT NULL) AS hits
        |  FROM ages
        |)
        |SELECT custkey,
        |  coalesce(array_to_string(
        |    CASE WHEN len(hits) = 6 THEN [] ELSE list_transform(hits, s -> 'human_situations:age_group:' || s) END,
        |    '|'), '') AS situations
        |FROM bands
        |""".stripMargin) { (s, dir) =>
      val lo = coalesce(when(col("c_custkey") % 13 === 0, lit(null)).otherwise(col("c_custkey") % 60), lit(0L))
      val hi = coalesce(when(col("c_custkey") % 17 === 0, lit(null))
        .otherwise((col("c_custkey") % 60) + (col("c_nationkey") % 40)), lit(120L))
      val hits = filter(array(
        when(lo <= 54 && hi >= 31, "adults"),
        when(lo <= 30 && hi >= 20, "young_adults"),
        when(lo <= 19 && hi >= 13, "teens"),
        when(lo <= 1 && hi >= 0, "infants"),
        when(lo <= 12 && hi >= 2, "children"),
        when(hi >= 55, "seniors")), x => x.isNotNull)
      Tables.customer(s, dir)
        .select(col("c_custkey").as("custkey"),
          array_join(
            when(size(hits) === 6, array().cast("array<string>"))
              .otherwise(transform(hits, s => concat(lit("human_situations:age_group:"), s))),
            "|").as("situations"))
    },

    // q51: URL fixing + structuring — fix_url's keep-http / add-scheme-on
    // -valid-domain / drop rules composed with transform_urls' '#'-suffix
    // title split (default title preserved from the reference). Raw
    // newline-separated url strings derive from customer columns with one
    // valid-https, one bare-domain, one titled, and one junk entry.
    "q51_urls" -> QueryDef.of(
      """WITH src AS (
        |  SELECT c_custkey AS custkey,
        |    'https://ex.com/c/' || CAST(c_custkey AS VARCHAR)
        |      || chr(10) || 'www.site-' || CAST(c_custkey % 50 AS VARCHAR) || '.org'
        |      || chr(10) || 'ex.org/page#Contact ' || CAST(c_custkey % 9 AS VARCHAR)
        |      || chr(10) || CASE WHEN c_custkey % 2 = 0 THEN 'not a url' ELSE 'bad-.domain' END AS raw
        |  FROM customer
        |), entries AS (
        |  SELECT custkey,
        |    list_transform(string_split(raw, chr(10)), s -> {
        |      'href': CASE WHEN contains(s, '#') THEN regexp_replace(s, '#[^#]*$', '') ELSE s END,
        |      'title': CASE WHEN contains(s, '#') THEN regexp_extract(s, '#([^#]*)$', 1) ELSE 'קישור' END
        |    }) AS us
        |  FROM src
        |), fixed AS (
        |  SELECT custkey,
        |    list_filter(list_transform(us, u -> {
        |      'href': CASE WHEN starts_with(u.href, 'http') THEN u.href
        |                   WHEN regexp_matches(u.href, '(?i)^[a-z0-9][a-z0-9\-\.]{0,61}[a-z0-9]\.[a-z]{2,}$') THEN 'http://' || u.href
        |                   ELSE NULL END,
        |      'title': u.title}), u -> u.href IS NOT NULL) AS us
        |  FROM entries
        |)
        |SELECT custkey,
        |  array_to_string(list_transform(us, u -> u.href || '^' || u.title), '|') AS urls
        |FROM fixed
        |""".stripMargin) { (s, dir) =>
      val raw = concat(
        lit("https://ex.com/c/"), col("c_custkey").cast("string"),
        lit("\nwww.site-"), (col("c_custkey") % 50).cast("string"), lit(".org"),
        lit("\nex.org/page#Contact "), (col("c_custkey") % 9).cast("string"),
        lit("\n"),
        when(col("c_custkey") % 2 === 0, "not a url").otherwise("bad-.domain"))
      val entries = transform(split(raw, "\n"), s => struct(
        when(s.contains("#"), regexp_replace(s, "#[^#]*$", "")).otherwise(s).as("href"),
        when(s.contains("#"), regexp_extract(s, "#([^#]*)$", 1)).otherwise(lit("קישור")).as("title")))
      val fixed = filter(
        transform(entries, u => struct(
          when(u.getField("href").startsWith("http"), u.getField("href"))
            .when(u.getField("href").rlike(DomainRe), concat(lit("http://"), u.getField("href")))
            .otherwise(lit(null)).as("href"),
          u.getField("title").as("title"))),
        u => u.getField("href").isNotNull)
      Tables.customer(s, dir)
        .select(col("c_custkey").as("custkey"),
          array_join(
            transform(fixed, u => concat(u.getField("href"), lit("^"), u.getField("title"))),
            "|").as("urls"))
    }
  )
}
