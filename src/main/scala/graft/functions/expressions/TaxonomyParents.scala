package graft.functions.expressions

import java.util.TreeSet

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native taxonomy parent expansion (helpers.py:100
  * `update_taxonomy_with_parents`): every ':'-delimited id contributes all
  * its ancestor prefixes of depth >= 2 (`a:b:c` → `a:b`, `a:b:c`), and the
  * result is the sorted distinct union — one compiled pass per row.
  *
  * Why native: the HOF form (`transform(ids, transform(sequence(2, n),
  * slice+array_join))` + `array_sort(array_distinct(...))`) is
  * CodegenFallback at every level and allocates a sliced copy per prefix
  * per id; after NormalizeTaxonomyIds went native this chain was what was
  * left of q47's interpreted tax. Prefixes here are substrings of the
  * original id (no re-join), deduped/sorted in one TreeSet.
  *
  * Sort order: TreeSet compares wrapped UTF8Strings (binary order) —
  * identical to `array_sort` / `sort_array` on StringType.
  *
  * Null input → null; null elements are skipped (the HOF form's transform
  * would propagate per-element nulls, but every call site feeds non-null
  * normalized ids — asserted equal in TaxonomySpec's property test).
  */
case class TaxonomyParents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TaxonomyParents.expand(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = TaxonomyParents.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.expand($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TaxonomyParents =
    copy(child = newChild)
  override def prettyName: String = "taxonomy_parents"
}

object TaxonomyParents {

  def apply(ids: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      TaxonomyParents(org.apache.spark.sql.graftbridge.ColumnBridge.expression(ids)))

  /** Called from generated code — one compiled pass over the id array. */
  def expand(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    val seen = new TreeSet[UTF8String]()
    var i = 0
    while (i < n) {
      val raw = ids.getUTF8String(i)
      if (raw != null) {
        val s = raw.toString
        // prefix at every ':' past the first (depth >= 2), plus the full id
        var colons = 0
        var j = 0
        while (j < s.length) {
          if (s.charAt(j) == ':') {
            colons += 1
            if (colons >= 2) seen.add(UTF8String.fromString(s.substring(0, j)))
          }
          j += 1
        }
        seen.add(UTF8String.fromString(s))
      }
      i += 1
    }
    val out = new Array[Any](seen.size)
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
