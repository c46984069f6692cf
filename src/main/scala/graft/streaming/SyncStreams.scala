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
  * partition path (a direct static overwrite of that path), so a
  * crashed-and-replayed batch overwrites its own partition instead of
  * appending duplicates — per-batch idempotent, the same posture as
  * the cluster sink's snapshot publish.
  */
object SyncStreams {

  /** The per-batch closure, exposed for direct testing (the spec calls
    * it exactly as the stream runner does). `stored` is the (key,
    * status, ord) snapshot; the batch carries the staged keys.
    *
    * The delta replaces its own `batch=<id>` partition path (staged,
    * then swapped in) — unconditionally idempotent, with none of the
    * dynamic-partition-overwrite failure modes: a replayed batch whose
    * delta shrank to EMPTY still truncates its stale partition (dynamic
    * mode only touches partitions present in the written data, so an
    * empty replay would leave the old rows on disk), and no session
    * conf is mutated (a set/restore dance races concurrent writers on
    * the shared session). An all-empty run still reads back fine: the
    * empty parquet carries a footer, and `batch` comes off the
    * directory name at read time. */
  def statusSyncSink(stored: DataFrame, outDir: String,
                     inactiveValue: String = "INACTIVE")(
      batch: DataFrame, batchId: Long): Unit =
    // repartition(1), NOT coalesce(1): a deactivation delta is
    // metadata-sized, and one writer task per batch stops the per-batch
    // dirs accumulating a near-empty file per shuffle partition (SURVEY
    // lesson 45) — but coalesce is narrow and would collapse the whole
    // reconcile reduce (keep-last merge + anti-join over the stored
    // keys) into that single task; the extra exchange moves only the
    // tiny output
    // stage-and-rename rather than overwriting the live batch dir: the
    // delta history under outDir is an externally readable surface, and
    // a crashed-batch replay replacing its own partition in place would
    // expose deleted files to a reader mid-scan (the AnnStreams delta
    // posture; race narrowed to the delete+rename instant)
    graft.sources.Sources.stageAndSwapDir(s"$outDir/batch=$batchId",
      batch.sparkSession.sparkContext.hadoopConfiguration) { staging =>
      StatusSync.reconcile(stored, batch, inactiveValue)
        .repartition(1).write.mode("overwrite").parquet(staging)
    }
}
