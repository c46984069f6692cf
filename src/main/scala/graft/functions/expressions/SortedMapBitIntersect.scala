package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.{DataType, IntegerType}

import org.apache.spark.sql.graftbridge.ColumnBridge

/** popcount of the AND of two bitmask maps (int block -> long bits) whose
  * key arrays are SORTED ascending — a merge-scan intersection in one
  * pass, O(|a|+|b|).
  *
  * This replaces the `aggregate(map_entries(a), 0, (acc, e) -> acc +
  * bit_count(e.value & element_at(b, e.key)))` higher-order form in the
  * exact-Jaccard pair stage (Dedup.jaccardPairs): HOFs are
  * CodegenFallback and `element_at` probes per entry, so the interpreted
  * chain allocates per element on EVERY candidate pair — the pair stage
  * is exactly where the O(n²/block) work lives. Here the whole
  * intersection compiles into the stage's generated Java.
  *
  * Caller contract: both maps come from `map_from_entries(sort_array(...))`
  * so keys are sorted; behavior on unsorted keys is undefined (misses).
  */
case class SortedMapBitIntersect(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  // analysis-time gate for the SQL-registered form: getInt/getLong on a
  // differently-typed Unsafe map reinterprets raw bytes — silently wrong
  // popcounts, never an error
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(org.apache.spark.sql.types.MapType(IntegerType, org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.MapType(IntegerType, org.apache.spark.sql.types.LongType))

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ma = a.asInstanceOf[MapData]; val mb = b.asInstanceOf[MapData]
    val ka = ma.keyArray(); val va = ma.valueArray()
    val kb = mb.keyArray(); val vb = mb.valueArray()
    var i = 0; var j = 0; var cnt = 0
    while (i < ma.numElements() && j < mb.numElements()) {
      val k1 = ka.getInt(i); val k2 = kb.getInt(j)
      if (k1 == k2) {
        cnt += java.lang.Long.bitCount(va.getLong(i) & vb.getLong(j)); i += 1; j += 1
      } else if (k1 < k2) i += 1 else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val ka = ctx.freshName("ka"); val va = ctx.freshName("va")
      val kb = ctx.freshName("kb"); val vb = ctx.freshName("vb")
      val k1 = ctx.freshName("k1"); val k2 = ctx.freshName("k2")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $ka = $a.keyArray();
         |org.apache.spark.sql.catalyst.util.ArrayData $va = $a.valueArray();
         |org.apache.spark.sql.catalyst.util.ArrayData $kb = $b.keyArray();
         |org.apache.spark.sql.catalyst.util.ArrayData $vb = $b.valueArray();
         |int $i = 0; int $j = 0; int $cnt = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $k1 = $ka.getInt($i); int $k2 = $kb.getInt($j);
         |  if ($k1 == $k2) {
         |    $cnt += java.lang.Long.bitCount($va.getLong($i) & $vb.getLong($j));
         |    $i++; $j++;
         |  } else if ($k1 < $k2) { $i++; } else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedMapBitIntersect =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_map_bit_intersect"
}

object SortedMapBitIntersect {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedMapBitIntersect(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
