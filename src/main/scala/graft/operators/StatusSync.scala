package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Presence-based status RECONCILIATION — the sync step every reference
  * update flow runs before its upsert (meser/utilities/
  * trigger_status_check.py:43 build_status_update_dataframe, invoked by
  * the day_care / child_care / meser org/branch/service flows).
  *
  * Contract (the CODE's, not the docstring's — the reference docstring
  * promises active-syncs too, the code only ever deactivates):
  *   - `stored` is the fetched table AFTER key extraction: (key, status,
  *     ord) with ord the fetch order. Duplicate keys LAST-WIN (the
  *     reference builds a dict in fetch order — overwrite semantics).
  *   - `stagedKeys` is the batch's key set (already stringified;
  *     dropna().astype(str) upstream).
  *   - Emitted: one row per stored key ABSENT from the staged set whose
  *     current status differs from `inactiveValue` — a NULL status
  *     differs (Python `None != 'INACTIVE'`), hence the null-safe
  *     comparison.
  *
  * Plan: keep-last routes through the TopKPerKey node (bounded heaps —
  * SURVEY lesson 41's keep-first argument mirrored for keep-last); the
  * staged set probes as a BROADCAST left-anti join (the driver-set →
  * join re-expression; at 100 TB the staged set rides a bloom filter,
  * q125's posture). Only (key, status, ord) ever shuffles.
  */
object StatusSync {

  def reconcile(stored: DataFrame, stagedKeys: DataFrame,
                inactiveValue: String = "INACTIVE"): DataFrame = {
    val lastWins = TopK.topKPerKey(
      stored.select(col("key"), col("status"), col("ord")),
      Seq(col("key")), Seq(col("ord").desc), 1)
    lastWins
      .join(broadcast(stagedKeys.select(col("key")).distinct()), Seq("key"), "left_anti")
      .filter(!(col("status") <=> lit(inactiveValue)))
      .select(col("key").as("id"), col("status").as("prior_status"),
        lit(inactiveValue).as("status"))
  }
}
