package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import org.apache.spark.sql.graftbridge.ColumnBridge

/** Single-pass MinHash sketch — a custom TypedImperativeAggregate
  * (SURVEY.md §8 round-3 candidate, pulled forward).
  *
  * Replaces the k-column form `agg(min(xxhash64(lit(0), h)), ...,
  * min(xxhash64(lit(k-1), h)))` + separate `collect_set` + join with ONE
  * aggregation buffer updated in a tight loop: per input hash, k
  * slot-salted xxhash64 rehashes against a long[k] of running minima.
  * The mixing replicates Spark's XxHash64(lit(i), h) exactly
  * (seed 42 → hashInt(i) → hashLong(h)), so signatures are bit-identical
  * to the column form — asserted in DedupSpec.
  *
  * Scale shape: map-side partial aggregation applies (ObjectHashAggregate
  * merges long[k] buffers), so the shuffle carries one k-long sketch per
  * (doc × partition), never per shingle.
  */
case class MinHashSketch(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val acc = XXH64.hashLong(h, XXH64.hashInt(i, 42L))
        if (acc < buf(i)) buf(i) = acc
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSketch =
    copy(child = newChild)
  override def prettyName: String = "minhash_sketch"
}

object MinHashSketch {
  /** Aggregate Column: long[k] of slot minima over the input hash column. */
  def apply(h: Column, k: Int): Column =
    ColumnBridge.column(
      new MinHashSketch(ColumnBridge.expression(h), k).toAggregateExpression())
}

/** Single-pass 64-bit SimHash sketch: one int[64] vote buffer per group
  * in place of 64 conditional-sum aggregate columns. Votes and the final
  * bit-pack replicate the column form exactly (bit j set iff the sum of
  * ±1 votes over bit j of xxhash64(token) is positive). */
case class SimHashSketch(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buf(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var sim = 0L
    var j = 0
    while (j < 64) { if (buf(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 64)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashSketch =
    copy(child = newChild)
  override def prettyName: String = "simhash_sketch"
}

object SimHashSketch {
  def apply(h: Column): Column =
    ColumnBridge.column(
      new SimHashSketch(ColumnBridge.expression(h)).toAggregateExpression())
}
