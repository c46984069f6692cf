package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.StatusSync

/** Streaming twin of q154 (status reconciliation): the reference runs
  * trigger_status_check once per FETCHED BATCH, so the stream-native
  * form is "each micro-batch is one sync" — every staged batch emits the
  * deactivation delta against the stored snapshot.
  *
  * A static-LEFT-ANTI-stream join is not a supported stream-static
  * shape (the stream must drive the join), so the sink runs the EXACT
  * batch operator per micro-batch via foreachBatch — zero
  * re-expression, the same plan the oracle gate verifies.
  *
  * Replay safety: each batch's delta lands in its own `batch=<id>`
  * partition through DYNAMIC partition overwrite, so a crashed-and-
  * replayed batch overwrites its own partition instead of appending
  * duplicates — per-batch idempotent, the same posture as the cluster
  * sink's snapshot publish.
  */
object SyncStreams {

  /** The per-batch closure, exposed for direct testing (the spec calls
    * it exactly as the stream runner does). `stored` is the (key,
    * status, ord) snapshot; the batch carries the staged keys. */
  def statusSyncSink(stored: DataFrame, outDir: String,
                     inactiveValue: String = "INACTIVE")(
      batch: DataFrame, batchId: Long): Unit = {
    val out = StatusSync.reconcile(stored, batch, inactiveValue)
      .withColumn("batch", lit(batchId))
    // The overwrite-mode conf must be read from the WRITER's session —
    // the reconciled frame's plan roots at `stored` (the outer session),
    // not at foreachBatch's cloned micro-batch session, so set it there.
    val spark = out.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try out.write.mode("overwrite").partitionBy("batch").parquet(outDir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
