package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator extension (SURVEY.md §6 ladder rung c): per-key top-k as
  * a first-class plan node instead of the window-function encoding.
  *
  * `row_number() OVER (PARTITION BY key ORDER BY ord) <= k` forces a full
  * shuffle of EVERY row followed by a per-partition sort — at 100 TB the
  * exchange carries the whole table to keep k rows per key. This operator
  * plans as partial bounded heaps on the map side (≤ k rows per key per
  * input partition ever reach the exchange) and a final heap per key after
  * the shuffle; no sort anywhere, memory bounded by k·keys per task. The
  * same two-phase shape Spark's own TakeOrderedAndProject uses for global
  * top-k, generalized per key.
  *
  * Semantics: the k FIRST rows per key group under `order` (ties broken by
  * the order itself — callers include a unique tiebreaker for determinism,
  * exactly as they must with row_number).
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    maxPartialKeys: Int = TopKPerKey.DefaultMaxPartialKeys) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  require(maxPartialKeys > 0, s"maxPartialKeys must be positive, got $maxPartialKeys")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {
  /** Cap on the partial phase's per-task heap map (distinct keys). The
    * map-side trim is an OPTIMIZATION — with high-cardinality keys the
    * map would otherwise grow one heap per distinct key per task, so
    * past the cap new keys bypass the trim and rows flow to the
    * exchange untrimmed (exactness is the final phase's job). The same
    * degrade-don't-die posture as hash aggregation's sort fallback.
    * ~1M keys ≈ tens of MB of heap headers + k rows each: safe next to
    * a default executor's memory, big enough that real groupings
    * (languages, shards, tenants) never hit it. */
  val DefaultMaxPartialKeys: Int = 1 << 20
}

/** Physical node; `partial = true` runs on the child's partitioning (the
  * map-side trim), `partial = false` declares ClusteredDistribution so
  * EnsureRequirements inserts the hash exchange — the standard two-phase
  * aggregate shape.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    maxPartialKeys: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))

  override def outputPartitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numBypassedRows" -> SQLMetrics.createMetric(sparkContext,
      "rows past the partial key cap (sent untrimmed)"))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    // the final phase must be exact, so only the partial phase may
    // bypass; its map then holds every key of the (clustered) partition,
    // which is output-sized — the hash-aggregate posture.
    val keyCap = if (partial) maxPartialKeys else Int.MaxValue
    val numOutputRows = longMetric("numOutputRows")
    val numBypassedRows = longMetric("numBypassedRows")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // max-heap on the sort order: head = worst kept row, evicted when a
      // better (order-smaller) row arrives. ALL emitted rows are copied —
      // Spark reuses UnsafeRow buffers across iterator steps, and a
      // buffering parent (collect, another operator) would otherwise see
      // bypassed rows corrupt. Bypass is already the degraded path, so
      // the per-row copy there is noise.
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      new Iterator[InternalRow] {
        private var pending: InternalRow = _
        private var drain: Iterator[InternalRow] = _

        // absorb input until a row must bypass or input is exhausted
        private def absorb(): InternalRow = {
          while (iter.hasNext) {
            val row = iter.next()
            val key = keyProj(row)
            heaps.get(key) match {
              case Some(heap) =>
                if (heap.size < limit) heap.enqueue(row.copy())
                else if (ord.compare(row, heap.head) < 0) {
                  heap.dequeue(); heap.enqueue(row.copy())
                }
              case None =>
                if (heaps.size >= keyCap) { numBypassedRows += 1; return row.copy() }
                val heap = mutable.PriorityQueue.empty[InternalRow](ord)
                heap.enqueue(row.copy())
                heaps.update(key.copy(), heap)
            }
          }
          null
        }

        override def hasNext: Boolean = {
          if (pending != null) return true
          if (drain != null) return drain.hasNext
          pending = absorb()
          if (pending != null) true
          else { drain = heaps.valuesIterator.flatMap(_.iterator); drain.hasNext }
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          numOutputRows += 1
          if (pending != null) { val r = pending; pending = null; r }
          else drain.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerKey → final(partial(child)). */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child, maxPartialKeys) =>
      TopKPerKeyExec(keys, order, k, partial = false, maxPartialKeys,
        TopKPerKeyExec(keys, order, k, partial = true, maxPartialKeys,
          planLater(child))) :: Nil
    case _ => Nil
  }
}
