package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}

import graft.plans.TopKPerKey

/** Per-key top-k through the custom plan node [[graft.plans.TopKPerKey]]
  * (partial bounded heaps before the exchange — ≤ k rows per key per input
  * partition ever shuffle — vs the window encoding's full-table shuffle +
  * sort). Requires the TopKPerKeyStrategy, registered by GraftSession /
  * GraftExtensions.
  */
object TopK {

  /** The k first rows per key group under `order`. Include a unique
    * tiebreaker in `order` for determinism (same contract as
    * row_number). Plain columns sort ascending; use `col.desc` etc. for
    * anything else.
    */
  /** @param maxPartialKeys cap on the map-side heap map (distinct keys
    *        per task) — past it, rows for NEW keys skip the trim and the
    *        final phase alone bounds them (degrade, don't die; see
    *        TopKPerKey.DefaultMaxPartialKeys) */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
                 maxPartialKeys: Int = TopKPerKey.DefaultMaxPartialKeys): DataFrame = {
    val sortOrder = order.map(c => ColumnBridge.eagerExpression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    DatasetBridge.ofRows(df.sparkSession,
      TopKPerKey(keys.map(ColumnBridge.eagerExpression), sortOrder, k,
        DatasetBridge.logicalPlan(df), maxPartialKeys))
  }
}
