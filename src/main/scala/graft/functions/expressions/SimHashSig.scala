package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of ONE document's token array, as a scalar expression:
  * the per-bit ±1 majority vote over the row's own token hashes in a
  * single Java loop — no explode, no aggregate, no shuffle (the same
  * map-only argument as [[MinHashSig]]).
  *
  * Every token OCCURRENCE votes (SimHash weights repeated tokens), which
  * is exactly what the exploded form fed [[SimHashSketch]]; hashing is
  * `xxhash64(token)` = XXH64.hashUTF8String(token, 42), so signatures are
  * bit-identical to the aggregate pipeline (asserted in DedupSpec).
  * [[SimHashSketch]] remains the grouped/mergeable realization.
  */
case class SimHashSig(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_sig expects array<string>, got ${other.catalogString}")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.SimHashSig.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
  override def prettyName: String = "simhash_sig"
}

object SimHashSig {
  /** Per-bit ±1 votes over xxhash64 of each token occurrence; bit j of
    * the result is set iff its vote sum is positive (ties -> 0, matching
    * the aggregate's `> 0`). Empty arrays yield 0L. */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      // null token -> skipped, matching the aggregate twin's null-row skip
      if (!tokens.isNullAt(i)) {
        val h = XXH64.hashUTF8String(tokens.getUTF8String(i), 42L)
        var j = 0
        while (j < 64) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }

  def apply(tokens: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      SimHashSig(org.apache.spark.sql.graftbridge.ColumnBridge.expression(tokens)))
}
