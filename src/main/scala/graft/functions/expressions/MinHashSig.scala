package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Whole MinHash signature of ONE document's shingle array, as a scalar
  * expression: long[k] slot minima computed in a single Java loop over
  * the row's own shingles — no explode, no aggregate, no shuffle.
  *
  * A per-document signature is a pure function of that document's shingle
  * set, so the explode → groupBy(id) → MinHashSketch encoding (one
  * shuffle of every shingle set per corpus pass) is re-expressible as a
  * map-only projection. The hashing is bit-identical to that pipeline
  * (`xxhash64(sh)` = XXH64.hashUTF8String(sh, 42); slot mixing
  * seed 42 → hashInt(i) → hashLong(h), the exact XxHash64(lit(i), h)
  * fold [[MinHashSketch]] replicates) — asserted signature-for-signature
  * in DedupSpec. Duplicate shingle occurrences cannot change a minimum,
  * so no pre-distinct is needed.
  *
  * [[MinHashSketch]] remains the GROUPED/mergeable realization (SQL
  * `minhash_sketch`, partition- or corpus-level sketches); this is the
  * per-row realization a dedup signature pass wants.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, "signature length must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string>, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashSig.compute(input.asInstanceOf[ArrayData], MinHashSig.salts(k)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // the double loop lives in a static helper so the generated method
      // stays tiny (JIT-friendly) and the expression stays inside the
      // whole-stage codegen span
      val salts = ctx.addReferenceObj("salts", MinHashSig.salts(k), "long[]")
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.expressions.MinHashSig.compute($c, $salts));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** Slot salts XXH64.hashInt(i, 42) — the inner-loop constant of the
    * XxHash64(lit(i), h) fold, hoisted out of the per-shingle loop. */
  private[expressions] def salts(k: Int): Array[Long] = {
    val s = new Array[Long](k)
    var i = 0
    while (i < k) { s(i) = XXH64.hashInt(i, 42L); i += 1 }
    s
  }

  /** long[k] of min over shingles of XXH64.hashLong(xxhash64(sh), salt_i).
    * An empty shingle array yields all-MaxValue slots (same as the
    * aggregate's untouched buffer — such rows band identically too). */
  def compute(shingles: ArrayData, salts: Array[Long]): Array[Long] = {
    val k = salts.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      // null shingle -> skipped, matching the aggregate twin (its update
      // ignores null input rows), not an NPE
      if (!shingles.isNullAt(j)) {
        val h = XXH64.hashUTF8String(shingles.getUTF8String(j), 42L)
        var i = 0
        while (i < k) {
          val acc = XXH64.hashLong(h, salts(i))
          if (acc < mins(i)) mins(i) = acc
          i += 1
        }
      }
      j += 1
    }
    mins
  }

  def apply(shingles: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      MinHashSig(org.apache.spark.sql.graftbridge.ColumnBridge.expression(shingles), k))
}
