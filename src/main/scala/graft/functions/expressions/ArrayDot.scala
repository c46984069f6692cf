package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native dot product of two numeric arrays in double precision — the
  * codegen'd replacement for `aggregate(zip_with(a, b, x*y), 0.0, +)`,
  * which is CodegenFallback and allocates per element (ruinous when a
  * pair join evaluates it per candidate). Semantics match the HOF form
  * bit-for-bit: left fold in index order from 0.0, null if the lengths
  * differ (zip_with pads with null) or any element is null.
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // analysis-time gate (the package convention — Shingles, XxHash64ArrayMin):
  // a non-array child would ClassCastException inside planning with no
  // column context, and an unsupported element type would throw per-task
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val supported = Set[DataType](DoubleType, FloatType, LongType, IntegerType)
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _)) if supported(a) && supported(b) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_dot needs two arrays of double/float/long/int, got $l and $r")
    }
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case DoubleType => a.getDouble(i)
    case FloatType => a.getFloat(i).toDouble
    case LongType => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case other => throw new IllegalArgumentException(s"array_dot: unsupported element type $other")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val (ta, tb) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += get(a, i, ta) * get(b, i, tb)
      i += 1
    }
    acc
  }

  private def genGet(v: String, i: String, t: DataType): String = t match {
    case DoubleType => s"$v.getDouble($i)"
    case FloatType => s"(double) $v.getFloat($i)"
    case LongType => s"(double) $v.getLong($i)"
    case IntegerType => s"(double) $v.getInt($i)"
    case other => throw new IllegalArgumentException(s"array_dot: unsupported element type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${genGet(a, i, elemType(left))} * ${genGet(b, i, elemType(right))};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "array_dot"
}

object ArrayDot {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
