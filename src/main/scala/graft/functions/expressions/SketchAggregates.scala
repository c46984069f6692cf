package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression]
    with ExpectsInputTypes {
  require(k >= 1, "minhash_sketch: k must be >= 1") // like its sibling aggregates

  // per-slot salts depend only on (i, seed) — computed once per task,
  // not once per input row (the update loop runs per SHINGLE, corpus-hot)
  @transient private lazy val salts: Array[Long] =
    Array.tabulate(k)(i => XXH64.hashInt(i, 42L))

  // analysis-time gate: the update loop casts to Long, so a wrong-typed
  // SQL call must fail in the analyzer, not as a runtime CCE in a task
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val ss = salts
      var i = 0
      while (i < k) {
        val acc = XXH64.hashLong(h, ss(i))
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
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression]
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)
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

/** Misra-Gries heavy-hitters sketch: top-k frequent strings per group in
  * ONE pass with a hard `capacity`-entry memory bound, as a mergeable
  * TypedImperativeAggregate.
  *
  * Why a sketch and not `groupBy(group, tok).count` + top-k: the exact
  * form's state is vocabulary-sized PER GROUP — per-domain or per-source
  * token tallies over a web corpus put millions of counters behind each
  * of millions of keys, and the exchange carries all of them. This
  * aggregate's partial state is ≤ `capacity` counters per (group ×
  * input partition) no matter the vocabulary; map-side partials merge
  * through ObjectHashAggregate exactly like minhash_sketch above, so at
  * 100 TB the shuffle is groups × capacity, not groups × vocabulary.
  *
  * Guarantees (classic MG + the mergeability result of Agarwal et al.,
  * "Mergeable Summaries", PODS'12 — merge = pointwise add, then subtract
  * the (capacity+1)-th largest counter and drop non-positives):
  *   - estimates never exceed true counts (counters only shed mass);
  *   - undercount ≤ n / (capacity+1) for n total updates, additive
  *     across any merge tree — so every item with true frequency above
  *     n/(capacity+1) survives to the final summary;
  *   - with capacity ≥ distinct items no decrement ever fires and every
  *     counter is EXACT (the regime q98's DuckDB oracle pins).
  *
  * `eval` emits the top `k` surviving entries as array<struct<tok,cnt>>
  * ordered by (cnt desc, tok asc) — the tok tiebreak makes boundary cuts
  * deterministic and engine-portable (binary order = codepoint order;
  * the corpus tokens are ASCII).
  */
case class FreqItemsSketch(child: Expression, capacity: Int, k: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Long]]
    with UnaryLike[Expression] with ExpectsInputTypes {
  require(capacity >= 1 && k >= 1, "freq_items_sketch: capacity and k must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tok", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, Long] =
    new java.util.HashMap[UTF8String, Long](capacity * 2)

  override def update(buf: java.util.HashMap[UTF8String, Long],
                      input: InternalRow): java.util.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      // counters are never stored <= 0, so the null-unboxed 0L from a
      // missing key is unambiguous "absent"
      val cur = buf.get(s)
      if (cur != 0L) buf.put(s, cur + 1L)
      else if (buf.size < capacity) buf.put(s.clone(), 1L) // own the bytes: eval may reuse its buffer
      else {
        // decrement-all: the O(capacity) step that sheds one unit from
        // every counter; amortized O(1) per update since each decrement
        // consumes a prior increment
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[UTF8String, Long],
                     b: java.util.HashMap[UTF8String, Long]): java.util.HashMap[UTF8String, Long] = {
    val bIt = b.entrySet().iterator()
    while (bIt.hasNext) {
      val e = bIt.next()
      a.put(e.getKey, a.get(e.getKey) + e.getValue) // missing key unboxes to 0L
    }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest counter from all, drop <=0:
      // the mergeable-summaries reduction that keeps the additive bound
      val counts = new Array[Long](a.size)
      var i = 0
      val vIt = a.values().iterator()
      while (vIt.hasNext) { counts(i) = vIt.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val thresh = counts(counts.length - capacity - 1)
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= thresh) it.remove() else e.setValue(e.getValue - thresh)
      }
    }
    a
  }

  override def eval(buf: java.util.HashMap[UTF8String, Long]): Any = {
    val entries = new Array[(UTF8String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val top = entries.sortWith { case ((t1, c1), (t2, c2)) =>
      c1 > c2 || (c1 == c2 && t1.compareTo(t2) < 0)
    }.take(k)
    new GenericArrayData(top.map { case (t, c) =>
      new GenericInternalRow(Array[Any](t, c)) })
  }

  override def serialize(buf: java.util.HashMap[UTF8String, Long]): Array[Byte] = {
    var bytes = 4
    val sIt = buf.keySet().iterator()
    while (sIt.hasNext) bytes += 12 + sIt.next().numBytes()
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val tb = e.getKey.getBytes
      bb.putInt(tb.length); bb.put(tb); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val m = new java.util.HashMap[UTF8String, Long](capacity * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val tb = new Array[Byte](len)
      bb.get(tb)
      m.put(UTF8String.fromBytes(tb), bb.getLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsSketch =
    copy(child = newChild)
  override def prettyName: String = "freq_items_sketch"
}

object FreqItemsSketch {
  /** Aggregate Column: top-`k` (tok, cnt) structs under a `capacity`-entry
    * Misra-Gries summary of the string column. */
  def apply(tok: Column, capacity: Int, k: Int): Column =
    ColumnBridge.column(
      new FreqItemsSketch(ColumnBridge.expression(tok), capacity, k)
        .toAggregateExpression())
}

/** Mergeable bottom-k-by-hash sample — the AGGREGATE realization of the
  * fixed-size per-stratum draw (q103), and its streaming-legal form.
  *
  * Keeps the k (sortKey, payload) pairs with the smallest keys, ties
  * broken by payload: a bounded max-heap per group, evicting the current
  * largest when a smaller pair arrives. With a uniform salted hash as the
  * key this is distributed reservoir sampling (uniform, deterministic,
  * rerun-stable) and the kept key set is exactly a KMV sketch. Merge is
  * heap-union-then-trim, so map-side partial aggregation applies: the
  * shuffle carries ≤ k pairs per group × partition, and in STREAMING the
  * complete-mode state per group is the serialized ≤ k-pair buffer —
  * hard-bounded on an open stream, which the TopKPerKey plan node
  * (batch q103's route) can never be.
  *
  * `eval` emits array<struct<h,id>> ascending by (h, id) — position+1 is
  * the sample rank, so `posexplode` reproduces q103's output exactly.
  */
case class BottomKSample(sortKey: Expression, payload: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Array[Long]]]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression]
    with ExpectsInputTypes {
  require(k >= 1, "bottom_k_sample: k must be >= 1")

  override def left: Expression = sortKey
  override def right: Expression = payload
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  // TreeSet ordered max-first on (h, id): first() is the eviction
  // candidate, and comparator equality DEDUPS — a re-offered (h, id)
  // pair can never occupy a second slot, which is what lets the KMV
  // sketch build run WITHOUT a pre-distinct shuffle (the kept key set
  // is duplicate-free by construction) and keeps the sampler honest on
  // replayed rows. Membership/eviction are O(log k).
  private def desc = BottomKSample.Desc

  override def createAggregationBuffer(): java.util.TreeSet[Array[Long]] =
    new java.util.TreeSet[Array[Long]](desc)

  private def offer(buf: java.util.TreeSet[Array[Long]], h: Long, id: Long): Unit = {
    if (buf.size < k) buf.add(Array(h, id)) // TreeSet add is a no-op on comparator-equal
    else {
      val worst = buf.first()
      if (h < worst(0) || (h == worst(0) && id < worst(1))) {
        // evict only if this was genuinely NEW (add is false on a dup)
        if (buf.add(Array(h, id))) buf.pollFirst()
      }
    }
  }

  override def update(buf: java.util.TreeSet[Array[Long]],
                      input: InternalRow): java.util.TreeSet[Array[Long]] = {
    val hv = sortKey.eval(input)
    val pv = payload.eval(input)
    if (hv != null && pv != null)
      offer(buf, hv.asInstanceOf[Long], pv.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[Array[Long]],
                     b: java.util.TreeSet[Array[Long]]): java.util.TreeSet[Array[Long]] = {
    val it = b.iterator()
    while (it.hasNext) { val e = it.next(); offer(a, e(0), e(1)) }
    a
  }

  override def eval(buf: java.util.TreeSet[Array[Long]]): Any = {
    val arr = buf.toArray(new Array[Array[Long]](buf.size))
    java.util.Arrays.sort(arr, desc.reversed()) // ascending (h, id)
    new GenericArrayData(arr.map(e => new GenericInternalRow(Array[Any](e(0), e(1)))))
  }

  override def serialize(buf: java.util.TreeSet[Array[Long]]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e(0)); bb.putLong(e(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Array[Long]] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val q = new java.util.TreeSet[Array[Long]](desc)
    var i = 0
    while (i < n) { q.add(Array(bb.getLong(), bb.getLong())); i += 1 }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BottomKSample =
    copy(sortKey = newLeft, payload = newRight)
  override def prettyName: String = "bottom_k_sample"
}

object BottomKSample {
  /** Max-first on (h, id) — a named Serializable class because the
    * aggregate (and its comparator field) ships inside streaming state
    * operators, where an anonymous Comparator fails closure cleaning. */
  private[expressions] object Desc extends java.util.Comparator[Array[Long]] with Serializable {
    override def compare(a: Array[Long], b: Array[Long]): Int = {
      val c = java.lang.Long.compare(b(0), a(0))
      if (c != 0) c else java.lang.Long.compare(b(1), a(1))
    }
  }

  /** Aggregate Column: the k smallest (sortKey, payload) pairs ascending. */
  def apply(sortKey: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(
      new BottomKSample(ColumnBridge.expression(sortKey),
        ColumnBridge.expression(payload), k).toAggregateExpression())
}
