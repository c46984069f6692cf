package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Decoupled tagger/filter architecture for a training corpus (the
  * Dolma attribute-store posture): taggers run ONCE over the text and
  * persist their outputs as SLIM per-doc attribute tables beside the
  * corpus; filter policies then compose by joining attributes back —
  * re-filtering under a new policy never re-reads bodies or re-runs a
  * tagger. Corpus and attribute tables are all bucketed identically on
  * the doc key, so a policy materialization is a ZERO-SHUFFLE
  * co-located sort-merge join chain even when the corpus is 100 TB and
  * each attribute table has a row per document
  * (AttributeStoreSpec pins the no-Exchange plan and policy ≡ inline).
  *
  * This composes the library's taggers: q28 lang-id, q29/q164 quality,
  * q165 Gopher rules, q80/q106/q162/q163 LM scores — anything slim and
  * doc-keyed qualifies.
  */
object AttributeStore {

  /** Persist one tagger's output as a bucketed attribute table.
    * `attrs` must carry `key` plus the attribute columns — never text.
    * Re-tagging REPLACES the table (drop + recreate, the dumpToTable
    * contract) — coordinate with concurrent policy readers the same way
    * as any snapshot swap: re-tag into a new table name and repoint, or
    * quiesce readers across the rewrite. */
  def writeAttributeTable(attrs: DataFrame, table: String,
                          key: String = "doc_id", nBuckets: Int = 16): Unit = {
    require(attrs.columns.contains(key), s"attribute table needs the '$key' column")
    Sources.dumpToTable(attrs, table, indexFields = Seq(key), nBuckets = nBuckets)
  }

  /** The corpus joined with the named attribute tables on `key` — the
    * frame a filter policy evaluates over. Every join is hinted merge:
    * identically-bucketed tables sort-merge co-located (zero exchange);
    * the hint only matters at test scale, where Spark would otherwise
    * broadcast. Policies `.filter(...)` the result and select what they
    * materialize.
    *
    * ==Join semantics — READ THIS if your policy negates predicates==
    * Joins default to LEFT outer (changed from inner in r10): a doc
    * missing a row in some attribute table (partially-written or stale
    * tagger output) surfaces as NULL attribute columns — which a
    * positive filter predicate (`attr > x`) drops, like the old inner
    * join, but which a NEGATED predicate (`!(attr > x)`, `attr =!= v`)
    * now KEEPS, because SQL three-valued logic evaluates `!(NULL > x)`
    * to NULL→dropped only for the un-negated form. Likewise aggregates
    * over the composed frame now see uncovered docs. Policies written
    * against the pre-r10 inner behavior that rely on uncovered-doc
    * exclusion should pass `joinType = "inner"` — the explicit opt-out —
    * or gate NULLs themselves (`attr.isNotNull && !(...)`). The left
    * default stands because a silent inner join made a coverage gap
    * indistinguishable from an intentional filter; a policy CAN now
    * distinguish (`attr.isNull` ≠ "tagger scored it low") and a
    * coverage audit can count. For hard guarantees pass
    * `assertCoverage = true`: one count per table (attr rows == corpus
    * rows) fails loud BEFORE any policy runs over a shrunken corpus —
    * opt-in because the counts are jobs, and a policy exploring an
    * intentionally-partial store (a tagger still backfilling) is
    * legitimate. */
  def compose(spark: SparkSession, corpusTable: String,
              attrTables: Seq[String], key: String = "doc_id",
              assertCoverage: Boolean = false,
              joinType: String = "left"): DataFrame = {
    require(joinType == "left" || joinType == "inner",
      s"compose joins attribute tables 'left' (default) or 'inner', got '$joinType'")
    if (assertCoverage) {
      // row-count equality alone is NOT coverage: a duplicated key can
      // cancel a missing one. Anti-join proves every corpus key present;
      // total == corpus count then forces exactly one row per key (no
      // dup fan-out, no rogue keys).
      val corpus = spark.table(corpusTable)
      val n = corpus.count()
      attrTables.foreach { t =>
        val attr = spark.table(t)
        val missing = corpus.select(key)
          .join(attr.select(key), Seq(key), "left_anti").count()
        require(missing == 0,
          s"attribute table $t is missing $missing of $n corpus keys — a " +
            "policy over it would silently shrink the corpus; re-tag or drop it")
        val a = attr.count()
        require(a == n,
          s"attribute table $t carries $a rows for $n covered corpus keys — " +
            "duplicate or rogue keys would fan policies out; re-tag it")
      }
    }
    attrTables.foldLeft(spark.table(corpusTable)) { (acc, t) =>
      acc.join(spark.table(t).hint("merge"), Seq(key), joinType)
    }
  }
}
