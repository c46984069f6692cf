package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.F

/** SURVEY.md §2.D — derived-output shapes from the reference's publish
  * pipelines: relevance scoring (to_es.py), nested search documents
  * (to_es.py/es_schemas.py), and sitemap path generation (to_sitemap.py).
  */
object DeriveQueries {

  val defs: Map[String, QueryDef] = Map(

    // q33: multiplicative relevance score (to_es.py:24 card_score — tiered
    // boosts, sqrt growth on entity counts). Shape preserved: boolean
    // multipliers, sqrt/linear branch-count term, kind-based boost.
    "q33_card_score" -> QueryDef.of(
      """SELECT c_custkey AS custkey,
        |  round(
        |    (CASE WHEN c_acctbal > 0 THEN 10.0 ELSE 1.0 END)
        |    * (CASE WHEN COUNT(o_orderkey) > 100 THEN COUNT(o_orderkey) / 10.0 ELSE sqrt(COUNT(o_orderkey)) END)
        |    * (CASE WHEN max(c_nationkey) IN (1, 2, 3) THEN 5.0 ELSE 1.0 END)
        |  , 4) AS score
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_acctbal
        |""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey").as("custkey"), col("c_acctbal"))
        .agg(count(col("o_orderkey")).as("n"), max(col("c_nationkey")).as("nk"))
        .select(
          col("custkey"),
          round(
            when(col("c_acctbal") > 0, 10.0).otherwise(1.0)
              * when(col("n") > 100, col("n") / 10.0).otherwise(sqrt(col("n")))
              * when(col("nk").isin(1, 2, 3), 5.0).otherwise(1.0),
            4).as("score"))
    },

    // q34: nested search documents (to_es.py data_api_es_flow +
    // es_schemas.py): entity root + sorted nested array of child structs —
    // the document shape Elasticsearch indexing consumes. Children sorted
    // for determinism (collect_list order is partition-dependent).
    "q34_es_docs" -> QueryDef.of(
      """SELECT c_custkey AS custkey, max(c_name) AS name,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  array_to_string(list_transform(
        |    list_sort(list({'orderkey': o_orderkey, 'status': o_orderstatus})),
        |    o -> CAST(o.orderkey AS VARCHAR) || ':' || o.status), '|') AS orders
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |""".stripMargin) { (s, dir) =>
      // Nested child array serialized 'orderkey:status|…' in the final
      // projection (both engines) so the driver can sort/hash the column.
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey").as("custkey"))
        .agg(
          max(col("c_name")).as("name"),
          count(lit(1)).as("n_orders"),
          array_join(
            transform(
              sort_array(collect_list(struct(
                col("o_orderkey").as("orderkey"),
                col("o_orderstatus").as("status")))),
              o => concat(o.getField("orderkey").cast("string"), lit(":"), o.getField("status"))),
            "|").as("orders"))
    },

    // q35: sitemap paths (to_sitemap.py:47 — '/c/{id}' with XML escaping).
    "q35_sitemap" -> QueryDef.of(
      """SELECT concat('/c/', replace(replace(entity_key, '''', '&apos;'), '"', '&quot;')) AS path
        |FROM (SELECT substr(md5(concat_ws('', c_name, CAST(c_custkey AS VARCHAR))), 1, 8) AS entity_key FROM customer)
        |""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .select(F.hashKey(col("c_name"), col("c_custkey")).as("entity_key"))
        .select(concat(lit("/c/"),
          regexp_replace(regexp_replace(col("entity_key"), "'", "&apos;"), "\"", "&quot;")).as("path"))
    }
  )
}
