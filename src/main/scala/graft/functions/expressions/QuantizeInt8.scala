package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd int8 symmetric quantizer: scale = 127 / max|x| per
  * vector, codes = round-half-away(x * scale), emitted directly as the
  * comma-joined serialization the row-compare gate consumes.
  *
  * This is the custom-Expression extension path (SURVEY.md §6): the
  * built-in composition (array_max over a transform, a second transform
  * for the codes, a cast to strings, array_join) chains FOUR
  * CodegenFallback higher-order evaluations per row, each allocating an
  * intermediate array — ~0.3 ms/vector at 64 dims, which is 80+ CPU-hours
  * per billion vectors. Here both passes (max-abs, emit) compile into the
  * stage's generated Java as tight primitive loops with one StringBuilder
  * allocation. Rounding is half-away-from-zero, matching both Spark's
  * round() (BigDecimal HALF_UP) and DuckDB's round() so the oracle
  * replays bit-for-bit.
  */
case class QuantizeInt8Csv(child: Expression) extends UnaryExpression {

  // Applied only through the typed wrapper below (array<float> enforced
  // with an explicit cast), so no ExpectsInputTypes machinery.
  override def dataType: DataType = StringType

  // Null ELEMENTS (reachable via the SQL-registered function on a cast
  // array with containsNull=true) quantize to code 0 — identically here
  // and in doGenCode, so the two paths can never diverge.
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val xs = new Array[Float](n)
    var i = 0
    while (i < n) {
      xs(i) = if (arr.isNullAt(i)) 0f else arr.getFloat(i); i += 1
    }
    UTF8String.fromString(QuantizeInt8Csv.eval(xs))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val maxAbs = ctx.freshName("maxAbs")
      val scale = ctx.freshName("scale")
      val v = ctx.freshName("v")
      val sb = ctx.freshName("sb")
      s"""
         |final int $n = $c.numElements();
         |double $maxAbs = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $v = $c.isNullAt($i) ? 0.0d : Math.abs((double) $c.getFloat($i));
         |  if ($v > $maxAbs) $maxAbs = $v;
         |}
         |final double $scale = 127.0 / Math.max($maxAbs, 1e-30);
         |final StringBuilder $sb = new StringBuilder($n * 5);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($i > 0) $sb.append(',');
         |  final double $v = $c.isNullAt($i) ? 0.0d : (double) $c.getFloat($i) * $scale;
         |  $sb.append((long) ($v >= 0 ? $v + 0.5d : $v - 0.5d));
         |}
         |${ev.value} = UTF8String.fromString($sb.toString());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8Csv =
    copy(child = newChild)
}

object QuantizeInt8Csv {
  def eval(xs: Array[Float]): String = {
    var maxAbs = 0.0
    var i = 0
    while (i < xs.length) {
      val v = math.abs(xs(i).toDouble); if (v > maxAbs) maxAbs = v; i += 1
    }
    val scale = 127.0 / math.max(maxAbs, 1e-30)
    val sb = new java.lang.StringBuilder(xs.length * 5)
    i = 0
    while (i < xs.length) {
      if (i > 0) sb.append(',')
      val v = xs(i).toDouble * scale
      sb.append((if (v >= 0) v + 0.5d else v - 0.5d).toLong)
      i += 1
    }
    sb.toString
  }

  /** Column wrapper (Spark 4 Columns wrap ColumnNodes, not Expressions). */
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      QuantizeInt8Csv(org.apache.spark.sql.graftbridge.ColumnBridge.expression(
        c.cast(ArrayType(FloatType)))))
}
