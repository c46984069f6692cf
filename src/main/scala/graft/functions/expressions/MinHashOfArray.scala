package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** min(xxhash64(element)) over ONE row's string array — the winnowing
  * fingerprint selection, map-only (the k=1 unsalted cousin of
  * [[MinHashSig]]). Replaces explode_outer → groupBy(id) → min(xxhash64)
  * with a codegen'd scalar: no shuffle, hash loop in Java.
  *
  * Null/empty semantics — a DELIBERATE divergence from the replaced
  * plan, stated precisely: explode_outer turns a null/empty array into
  * one null element, and xxhash64(null) returns its SEED (42), so the
  * old pipeline fingerprinted contentless documents as 42 — a real
  * value that could collide with genuine fingerprints in winnowing
  * matches. Here NULL input yields NULL and an empty array yields NULL
  * (no minimum over zero elements): no content → no fingerprint
  * (TextAnalysis.minShingleFingerprints documents the same contract).
  */
case class XxHash64ArrayMin(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"xxhash64_array_min expects array<string>, got ${other.catalogString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  // an empty array has no minimum -> null (see the class doc: the
  // replaced explode_outer form returned the hash SEED here)
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null else XxHash64ArrayMin.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.expressions.XxHash64ArrayMin.compute($c);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): XxHash64ArrayMin =
    copy(child = newChild)
  override def prettyName: String = "xxhash64_array_min"
}

object XxHash64ArrayMin {
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    var min = Long.MaxValue
    var i = 0
    while (i < n) {
      // null element -> the seed unchanged (42), exactly what xxhash64(null)
      // returns, so interpreted/codegen agree with the explode+min form
      // even on containsNull=true inputs
      val h =
        if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      if (h < min) min = h
      i += 1
    }
    min
  }

  def apply(arr: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      XxHash64ArrayMin(org.apache.spark.sql.graftbridge.ColumnBridge.expression(arr)))
}
