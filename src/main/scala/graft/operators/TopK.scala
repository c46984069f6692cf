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

  /** [[topKPerKey]] + a rank column — the drop-in for the
    * `row_number() <= k` encoding when the rank itself is output
    * (q26/q27/q40's per-query top-k). The plan-node trim runs FIRST, so
    * the rank window sorts only the surviving ≤ k·keys rows; and since
    * the final phase already clustered the frame on `key`, the window
    * reuses that partitioning — no additional exchange (PlanSpec pins
    * it). Ranks match the plain window encoding exactly whenever `order`
    * is total within a key group (the only regime row_number is
    * deterministic in anyway).
    */
  def topKWithRank(df: DataFrame, key: Column, order: Seq[Column], k: Int,
                   rankName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    topKPerKey(df, Seq(key), order, k)
      .withColumn(rankName, row_number().over(Window.partitionBy(key).orderBy(order: _*)))
  }
}
