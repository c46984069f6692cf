package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import org.apache.spark.sql.graftbridge.ColumnBridge

/** Product-quantization codec — the billion-scale ANN memory layout
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011): the vector splits into `m` subspaces, each
  * sub-vector quantizes to its nearest of `ks` per-subspace centroids,
  * and the whole embedding stores as `m` code BYTES. Query-time ADC
  * (asymmetric distance computation) precomputes one m×ks distance
  * table per query and scores candidates with m table lookups — no
  * float math per candidate.
  *
  * All three kernels are native codegen Expressions (the per-candidate
  * ADC lookup is the hot path — an interpreted HOF or UDF there would
  * dominate the scan): codebooks ride into generated code as reference
  * objects, not literal trees. The per-subspace squared-distance inner
  * loop is shared between encode and table build ([[PqCodec]]) so the
  * two sides can never drift — ADC ordering rests on them agreeing.
  */
object PqCodec {

  /** Construction-time shape gate shared by both codebook expressions:
    * runs BEFORE any dimension is derived, so an empty or ragged
    * codebook reports cleanly instead of AIOOBE-ing in a field
    * initializer. */
  private[expressions] def validate(fn: String, cb: Array[Array[Array[Float]]]): Unit = {
    require(cb != null && cb.nonEmpty && cb.forall(j => j != null && j.nonEmpty),
      s"$fn: codebook must have at least one centroid per subspace")
    val ks = cb(0).length
    val subDim = cb(0)(0).length
    require(ks > 1 && ks <= 256, s"$fn: need 2..256 centroids per subspace, got $ks")
    require(subDim > 0, s"$fn: sub-vector dimension must be positive")
    require(cb.forall(_.length == ks) && cb.forall(_.forall(_.length == subDim)),
      s"$fn: ragged codebook (every subspace needs $ks centroids of $subDim dims)")
  }

  /** Interpreted-path squared distance of sub-vector j to centroid c.
    * NaN signals a null element (callers return null). */
  private[expressions] def subDist(a: ArrayData, j: Int, c: Int,
                                   cb: Array[Array[Array[Float]]], subDim: Int,
                                   isDouble: Boolean): Double = {
    var d = 0.0
    var i = 0
    while (i < subDim) {
      if (a.isNullAt(j * subDim + i)) return Double.NaN
      val x = if (isDouble) a.getDouble(j * subDim + i) else a.getFloat(j * subDim + i).toDouble
      val diff = x - cb(j)(c)(i)
      d += diff * diff
      i += 1
    }
    d
  }

  /** Codegen snippet for the same loop: leaves the squared distance in
    * `d` and sets `ev.isNull` on a null element — identical arithmetic
    * to [[subDist]] by construction (one shared template). */
  private[expressions] def subDistGen(a: String, cb: String, j: String, c: String,
                                      i: String, d: String, subDim: Int,
                                      isDouble: Boolean, isNull: String): String = {
    val getElem =
      if (isDouble) s"$a.getDouble($j * $subDim + $i)"
      else s"(double) $a.getFloat($j * $subDim + $i)"
    s"""double $d = 0.0;
       |for (int $i = 0; $i < $subDim; $i++) {
       |  if ($a.isNullAt($j * $subDim + $i)) { $isNull = true; break; }
       |  double __x = $getElem;
       |  double __df = __x - $cb[$j][$c][$i];
       |  $d += __df * __df;
       |}""".stripMargin
  }
}

/** Encode: array<float|double> → binary of `m` codes. Null element or a
  * length ≠ m·subDim yields null (the ArrayDot convention). Ties in the
  * per-subspace argmin break to the LOWEST code — deterministic. */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Float]]])
    extends UnaryExpression {

  PqCodec.validate("pq_encode", codebook)
  private val m = codebook.length
  private val ks = codebook(0).length
  private val subDim = codebook(0)(0).length

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<float|double>, got $other")
  }

  // fixed once the child resolves; a def here would pattern-match per
  // ELEMENT on the interpreted path
  private lazy val isDouble = child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != m * subDim) return null
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < ks) {
        val d = PqCodec.subDist(a, j, c, codebook, subDim, isDouble)
        if (d.isNaN) return null
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[][][]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j"); val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val bestD = ctx.freshName("bestD")
      val best = ctx.freshName("best")
      s"""
         |if ($a.numElements() != ${m * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  byte[] $out = new byte[$m];
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    int $best = 0; double $bestD = Double.MAX_VALUE;
         |    for (int $c = 0; $c < $ks; $c++) {
         |      ${PqCodec.subDistGen(a, cb, j, c, i, d, subDim, isDouble, ev.isNull)}
         |      if (${ev.isNull}) break;
         |      if ($d < $bestD) { $bestD = $d; $best = $c; }
         |    }
         |    $out[$j] = (byte) $best;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

object PqEncode {
  def apply(c: Column, codebook: Array[Array[Array[Float]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(c), codebook))
}

/** Per-query ADC distance table, FLATTENED: array<float> of m·ks entries,
  * entry j·ks+c = squared L2 distance between the query's j-th
  * sub-vector and centroid c of subspace j (accumulated in DOUBLE, cast
  * to float once per cell). Evaluated once per QUERY row (the tiny side
  * of the probe join). */
case class PqDistTable(child: Expression, codebook: Array[Array[Array[Float]]])
    extends UnaryExpression {

  PqCodec.validate("pq_dist_table", codebook)
  private val m = codebook.length
  private val ks = codebook(0).length
  private val subDim = codebook(0)(0).length

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_dist_table needs array<float|double>, got $other")
  }

  private lazy val isDouble = child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != m * subDim) return null
    val out = new Array[Float](m * ks)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        val d = PqCodec.subDist(a, j, c, codebook, subDim, isDouble)
        if (d.isNaN) return null
        out(j * ks + c) = d.toFloat
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  // query-side only (a handful of rows per batch): the interpreted path
  // is fine, but staying codegen avoids fencing the query projection
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[][][]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j"); val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != ${m * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  float[] $out = new float[${m * ks}];
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    for (int $c = 0; $c < $ks; $c++) {
         |      ${PqCodec.subDistGen(a, cb, j, c, i, d, subDim, isDouble, ev.isNull)}
         |      if (${ev.isNull}) break;
         |      $out[$j * $ks + $c] = (float) $d;
         |    }
         |  }
         |  if (!${ev.isNull}) ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqDistTable =
    copy(child = newChild)
  override def prettyName: String = "pq_dist_table"
}

object PqDistTable {
  def apply(c: Column, codebook: Array[Array[Array[Float]]]): Column =
    ColumnBridge.column(PqDistTable(ColumnBridge.expression(c), codebook))
}

/** ADC score: m table lookups summed — the per-candidate hot kernel.
  * `left` = the candidate's m-byte code, `right` = the query's flattened
  * m×ks table. Returns the approximate squared L2 distance (rank
  * ASCENDING with nulls LAST; on unit vectors ‖a−b‖² = 2−2cos, so the
  * ordering equals the cosine ordering). A null table CELL yields a
  * null score (tables from arbitrary sources may carry nulls —
  * silently reading the slot would understate the distance). */
case class PqAdcScore(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {

  require(ks > 1 && ks <= 256, s"pq_adc: need 2..256 centroids, got $ks")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc needs (binary, array<float>), got $l and $r")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[Array[Byte]]
    val table = r.asInstanceOf[ArrayData]
    if (table.numElements() != codes.length * ks) return null
    var acc = 0.0
    var j = 0
    while (j < codes.length) {
      val slot = j * ks + (codes(j) & 0xFF)
      if (table.isNullAt(slot)) return null
      acc += table.getFloat(slot)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, table) => {
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val slot = ctx.freshName("slot")
      s"""
         |if ($table.numElements() != $codes.length * $ks) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $codes.length; $j++) {
         |    int $slot = $j * $ks + (($codes[$j]) & 0xFF);
         |    if ($table.isNullAt($slot)) { ${ev.isNull} = true; break; }
         |    $acc += $table.getFloat($slot);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc"
}

object PqAdcScore {
  def apply(codes: Column, table: Column, ks: Int): Column =
    ColumnBridge.column(PqAdcScore(
      ColumnBridge.expression(codes), ColumnBridge.expression(table), ks))
}
