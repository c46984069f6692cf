package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Profile

/** q104: the table profiler over the widest test table ([[graft.operators
  * .Profile]] — two scans for any column count; see the operator scaladoc
  * for why N count(DISTINCT) aggregates in one pass would Expand-blow-up
  * the scan instead).
  *
  * The oracle is the blunt per-column UNION ALL — 11 separate full-column
  * aggregates. That asymmetry is the point: DuckDB replays the SEMANTICS
  * column by column, while the Spark plan produces identical numbers from
  * two passes; the hash gate proves the fused plan loses nothing.
  */
object ProfileQueries {

  private val IntCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
  private val DblCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val OthCols = Seq("l_returnflag", "l_linestatus", "l_shipdate")
  private val AllCols = IntCols ++ DblCols ++ OthCols

  // per-column oracle row; floats render through DECIMAL(18,2) on both
  // engines (shortest-roundtrip double printing is engine-specific)
  private def colSql(c: String, isDouble: Boolean): String = {
    val rendered = if (isDouble) s"CAST(CAST($c AS DECIMAL(18,2)) AS VARCHAR)" else s"CAST($c AS VARCHAR)"
    val minS = if (isDouble) s"CAST(CAST(MIN($c) AS DECIMAL(18,2)) AS VARCHAR)" else s"CAST(MIN($c) AS VARCHAR)"
    val maxS = if (isDouble) s"CAST(CAST(MAX($c) AS DECIMAL(18,2)) AS VARCHAR)" else s"CAST(MAX($c) AS VARCHAR)"
    s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
       |  COUNT(*) - COUNT($c) AS n_nulls,
       |  COUNT(DISTINCT $rendered) AS n_distinct,
       |  $minS AS min_s, $maxS AS max_s FROM lineitem""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "q104_table_profile" -> QueryDef.of(
      AllCols.map(c => colSql(c, DblCols.contains(c))).mkString("", "\nUNION ALL\n", "\n")) {
      (s, dir) => Profile.profile(Tables.lineitem(s, dir), AllCols,
        // test tables are single-split: parallelism must follow CPU
        repartitionTo = Some(s.sparkContext.defaultParallelism))
    }
  )
}
