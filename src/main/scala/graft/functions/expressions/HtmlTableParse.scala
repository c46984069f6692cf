package graft.functions.expressions

import java.util.regex.Pattern

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused HTML-table parse — the one-pass form of
  * [[graft.operators.HtmlTable]]'s composed chain (reference
  * operators/child_care/fetch_as_df.py:19, pd.read_html semantics for
  * the first-table subset).
  *
  * Why native: the composed chain evaluates three separate regex
  * expressions with materialized intermediate arrays (the full row
  * array, then every row's cell array) and crosses two Generate nodes,
  * re-evaluating `element_at(hdr, …)` per cell — at sf1 the q157 probe
  * showed 1.9× per-row task-time drift from exactly that
  * allocation/GC pressure. Here one compiled pass walks the SAME
  * precompiled `java.util.regex` patterns (semantics bit-identical to
  * `regexp_extract`/`regexp_extract_all` — both engines run
  * java.util.regex, and the DuckDB oracle replays the same trees) and
  * emits the final (row_n, col_n, col_name, value) structs directly:
  * one output array per document, no intermediate row/cell arrays, the
  * header resolved once per column index. A single posexplode then
  * unpivots — the map-only zero-exchange plan shape is unchanged.
  *
  * Contract parity with the composed form: first `<table>` only; row 0
  * is the header whatever cell tag it uses; attribute-tolerant open
  * tags; header-only tables emit nothing (empty array → explode drops
  * the doc); empty cells survive as `''` values; a data cell beyond the
  * header width carries a null col_name (`element_at` out-of-range).
  */
case class HtmlTableParse(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("row_n", LongType, nullable = false),
    StructField("col_n", LongType, nullable = false),
    StructField("col_name", StringType, nullable = true),
    StructField("value", StringType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    HtmlTableParse.run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${HtmlTableParse.getClass.getName.stripSuffix("$")}.run($c);")

  override protected def withNewChildInternal(newChild: Expression): HtmlTableParse =
    copy(child = newChild)
  override def prettyName: String = "html_table_parse"
}

object HtmlTableParse {

  def apply(html: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      HtmlTableParse(org.apache.spark.sql.graftbridge.ColumnBridge.expression(html)))

  // The EXACT patterns of the composed chain (HtmlTable's SQL strings):
  // non-greedy first-table capture; attribute-bearing open tags admit
  // `<td align=..>` without letting `<thead>` masquerade as a cell
  // (attributes must start with whitespace). java.util.regex `.` does
  // not cross line terminators — the same non-DOTALL semantics as
  // Spark's regexp functions and the DuckDB RE2 oracle.
  private val TablePat = Pattern.compile("<table[^>]*>(.*?)</table>")
  private val RowPat = Pattern.compile("<tr(?:\\s[^>]*)?>(.*?)</tr>")
  private val CellPat = Pattern.compile("<t[dh](?:\\s[^>]*)?>(.*?)</t[dh]>")

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Called from generated code. */
  def run(html: UTF8String): GenericArrayData = {
    val s = html.toString
    val tm = TablePat.matcher(s)
    if (!tm.find()) return Empty
    val rm = RowPat.matcher(tm.group(1))
    if (!rm.find()) return Empty // no header row at all
    val hdr = ArrayBuffer.empty[UTF8String]
    val hm = CellPat.matcher(rm.group(1))
    while (hm.find()) hdr += UTF8String.fromString(hm.group(1))
    val out = ArrayBuffer.empty[Any]
    var rowN = 0L
    while (rm.find()) {
      rowN += 1
      val cm = CellPat.matcher(rm.group(1))
      var colN = 0L
      while (cm.find()) {
        colN += 1
        val name = if (colN <= hdr.length) hdr((colN - 1).toInt) else null
        out += new GenericInternalRow(Array[Any](
          rowN, colN, name, UTF8String.fromString(cm.group(1))))
      }
    }
    new GenericArrayData(out.toArray)
  }
}
