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
  * and the whole embedding stores as `m` code BYTES (64 floats → 8
  * bytes here, 32×). Query-time ADC (asymmetric distance computation)
  * precomputes one m×ks distance table per query and scores candidates
  * with m table lookups — no float math per candidate.
  *
  * All three kernels are native codegen Expressions (the per-candidate
  * ADC lookup is the hot path — an interpreted HOF or UDF there would
  * dominate the scan): codebooks ride into generated code as reference
  * objects, not literal trees.
  */

/** Encode: array<float|double> → binary of `m` codes. Null element or a
  * length ≠ m·subDim yields null (the ArrayDot convention). Ties in the
  * per-subspace argmin break to the LOWEST code — deterministic. */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Float]]])
    extends UnaryExpression {

  private val m = codebook.length
  private val ks = codebook(0).length
  private val subDim = codebook(0)(0).length
  require(m > 0 && ks > 1 && ks <= 256 && subDim > 0,
    s"pq_encode: need 1..256 centroids per subspace, got m=$m ks=$ks subDim=$subDim")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<float|double>, got $other")
  }

  private def isDouble = child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != m * subDim) return null
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < ks) {
        var d = 0.0; var i = 0
        while (i < subDim) {
          if (a.isNullAt(j * subDim + i)) return null
          val x = if (isDouble) a.getDouble(j * subDim + i) else a.getFloat(j * subDim + i).toDouble
          val diff = x - codebook(j)(c)(i)
          d += diff * diff
          i += 1
        }
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
      val best = ctx.freshName("best"); val x = ctx.freshName("x"); val df = ctx.freshName("df")
      val getElem =
        if (isDouble) s"$a.getDouble($j * $subDim + $i)"
        else s"(double) $a.getFloat($j * $subDim + $i)"
      s"""
         |if ($a.numElements() != ${m * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  byte[] $out = new byte[$m];
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    int $best = 0; double $bestD = Double.MAX_VALUE;
         |    for (int $c = 0; $c < $ks; $c++) {
         |      double $d = 0.0;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        if ($a.isNullAt($j * $subDim + $i)) { ${ev.isNull} = true; break; }
         |        double $x = $getElem;
         |        double $df = $x - $cb[$j][$c][$i];
         |        $d += $df * $df;
         |      }
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
  * sub-vector and centroid c of subspace j. Evaluated once per QUERY row
  * (the tiny side of the probe join). */
case class PqDistTable(child: Expression, codebook: Array[Array[Array[Float]]])
    extends UnaryExpression {

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

  private def isDouble = child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != m * subDim) return null
    val out = new Array[Float](m * ks)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        var d = 0.0; var i = 0
        while (i < subDim) {
          if (a.isNullAt(j * subDim + i)) return null
          val x = if (isDouble) a.getDouble(j * subDim + i) else a.getFloat(j * subDim + i).toDouble
          val diff = x - codebook(j)(c)(i)
          d += diff * diff
          i += 1
        }
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
      val d = ctx.freshName("d"); val x = ctx.freshName("x"); val df = ctx.freshName("df")
      val getElem =
        if (isDouble) s"$a.getDouble($j * $subDim + $i)"
        else s"(double) $a.getFloat($j * $subDim + $i)"
      s"""
         |if ($a.numElements() != ${m * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  float[] $out = new float[${m * ks}];
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    for (int $c = 0; $c < $ks; $c++) {
         |      double $d = 0.0;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        if ($a.isNullAt($j * $subDim + $i)) { ${ev.isNull} = true; break; }
         |        double $x = $getElem;
         |        double $df = $x - $cb[$j][$c][$i];
         |        $d += $df * $df;
         |      }
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
  * ASCENDING; on unit vectors ‖a−b‖² = 2−2cos, so the ordering equals
  * the cosine ordering). */
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
      acc += table.getFloat(j * ks + (codes(j) & 0xFF))
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, table) => {
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |if ($table.numElements() != $codes.length * $ks) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $codes.length; $j++) {
         |    $acc += $table.getFloat($j * $ks + (($codes[$j]) & 0xFF));
         |  }
         |  ${ev.value} = $acc;
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
