package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTML TABLE extraction (reference operators/child_care/
  * fetch_as_df.py:19 transform — pd.read_html semantics for the subset
  * a crawl-harvest pipeline needs): the FIRST `<table>` only, row 0 is
  * the header whatever cell tag it uses (`th` or `td`, attributes
  * tolerated on `tr`/`td`/`th`), remaining rows unpivot to
  * (doc_id, row_n, col_n, col_name, value) with empty cells kept as
  * `''` values. A header-only table yields zero records (`df[1:]` of a
  * one-row frame).
  *
  * Plan: map-only, zero joins, zero exchanges at any scale. The parse
  * itself is the fused [[graft.functions.expressions.HtmlTableParse]]
  * — one compiled pass emitting the final structs, no intermediate
  * row/cell arrays (the composed regexp_extract_all → posexplode × 2
  * chain is kept below as the measured reference; ProfHtml records the
  * gap, PropertySpec pins equality). Identical java.util.regex trees
  * on the DuckDB oracle side, so q157's hash gate pins the parser.
  */
object HtmlTable {

  /** `docs`: (doc_id, html) → (doc_id, row_n, col_n, col_name, value),
    * 1-based row/col numbers over the first table's data rows. */
  def extract(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(graft.functions.expressions.HtmlTableParse(col("html"))).as("c"))
      .select(col("doc_id"), col("c.row_n").as("row_n"), col("c.col_n").as("col_n"),
        col("c.col_name").as("col_name"), col("c.value").as("value"))

  // attribute-tolerant open tags: `(?:\s[^>]*)?` admits `<td align=..>`
  // without letting `<thead>` masquerade as a cell (attributes must
  // start with whitespace)
  private val RowPat = "<tr(?:\\\\s[^>]*)?>(.*?)</tr>"
  private val CellPat = "<t[dh](?:\\\\s[^>]*)?>(.*?)</t[dh]>"

  /** The composed-expression form of [[extract]] — three regex
    * evaluations + two Generate stages with materialized intermediate
    * arrays. Semantics identical (PropertySpec asserts row-for-row
    * equality on arbitrary generated tables); kept as the ProfHtml
    * measurement reference for the fused expression's gain. */
  private[graft] def extractComposed(docs: DataFrame): DataFrame =
    docs
      .withColumn("tbl", regexp_extract(col("html"), "<table[^>]*>(.*?)</table>", 1))
      .withColumn("rows", expr(s"regexp_extract_all(tbl, '$RowPat', 1)"))
      .filter(size(col("rows")) > 1)
      .withColumn("hdr", expr(s"regexp_extract_all(element_at(rows, 1), '$CellPat', 1)"))
      .select(col("doc_id"), col("hdr"),
        posexplode(expr("slice(rows, 2, size(rows) - 1)")).as(Seq("rpos", "rowhtml")))
      .withColumn("cells", expr(s"regexp_extract_all(rowhtml, '$CellPat', 1)"))
      .select(col("doc_id"), (col("rpos") + 1).cast("long").as("row_n"),
        col("hdr"), posexplode(col("cells")).as(Seq("cpos", "value")))
      .select(col("doc_id"), col("row_n"), (col("cpos") + 1).cast("long").as("col_n"),
        element_at(col("hdr"), (col("cpos") + 1).cast("int")).as("col_name"),
        col("value"))
}
