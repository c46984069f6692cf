package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** The multimodal STUB feature fold as a native expression: dim features,
  * feature i = ((1125899906842597 + i) * 31^n + K mod 2^64) & 0xFFFF,
  * scaled to [0,1] float, where n is the payload length and
  * K = sum(byte_j * 31^(n-1-j)) — algebraically identical to folding
  * `acc = acc * 31 + byte` from an index-salted seed, so ONE pass over
  * the bytes serves every feature slot (the mapPartitions stub re-folded
  * the payload per slot).
  *
  * This exists because the fake fold needs no per-partition codec init —
  * keeping it inside whole-stage codegen removes q32's only codegen
  * break (round-2 VERDICT finding #4). The typed
  * `Multimodal.extractFeatures` mapPartitions path REMAINS the documented
  * contract a real decoder swaps into; MultimodalSpec pins the two paths
  * bit-equal.
  */
case class MediaFeatureFold(child: Expression, dim: Int) extends UnaryExpression {

  require(dim >= 1, "feature dim must be >= 1")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MediaFeatureFold.fold(input.asInstanceOf[Array[Byte]], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = MediaFeatureFold.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.fold($c, $dim);"
    })

  override protected def withNewChildInternal(newChild: Expression): MediaFeatureFold =
    copy(child = newChild)
  override def prettyName: String = "media_feature_fold"
}

object MediaFeatureFold {

  def apply(media: Column, dim: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      MediaFeatureFold(org.apache.spark.sql.graftbridge.ColumnBridge.expression(media), dim))

  /** Called from generated code. Long arithmetic wraps mod 2^64, so the
    * affine split (seed * 31^n + K) is bit-identical to the sequential
    * fold for every seed. */
  def fold(bytes: Array[Byte], dim: Int): GenericArrayData = {
    var pow = 1L // 31^n
    var k = 0L   // sum byte_j * 31^(n-1-j)
    var j = 0
    while (j < bytes.length) {
      k = k * 31 + bytes(j)
      pow = pow * 31
      j += 1
    }
    val out = new Array[Any](dim)
    var i = 0
    while (i < dim) {
      val acc = (1125899906842597L + i) * pow + k
      out(i) = ((acc & 0xFFFFL).toFloat / 65535.0f)
      i += 1
    }
    new GenericArrayData(out)
  }
}
