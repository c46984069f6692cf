package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Similarity

/** Streaming ingest into a SAVED ANN artifact (IVF or IVFADC) — the
  * live half of the index lifecycle. The batch path
  * ([[Similarity.appendToIvfIndex]]) appends straight into the base
  * cells, which is exactly-once only if the CALLER never replays; a
  * streaming source replays crashed micro-batches by contract, so the
  * sink lands each batch in an LSM-style DELTA ZONE instead:
  *
  *   `<dir>/delta/ingest_batch=<id>/cell=<c>/part-*.parquet`
  *
  * Each micro-batch assigns its vectors against the artifact's FROZEN
  * quantizer(s) — nearest saved centroid map-side, plus the frozen
  * codebook's PQ code when the artifact is composed (the sink
  * auto-detects the family) — and statically overwrites ITS OWN
  * `ingest_batch=<id>` partition path. A crashed-and-replayed batch
  * overwrites itself rather than appending duplicates, an empty replay
  * still truncates whatever the crashed attempt left, and no session
  * conf is mutated (the statusSyncSink posture). Probes see delta rows
  * immediately: every saved probe path reads base + delta as separate
  * segments joined against the broadcast probes BEFORE the union, so
  * `cell` — a partition column in both zones — keeps pruning each scan.
  * [[Similarity.compactIvfIndex]] folds the delta back into one base
  * file per cell; the ingest-vs-compaction cadence is operational, not
  * correctness: a probe between any two batches is complete and
  * duplicate-free.
  *
  * Tombstoned ids fail the batch loud (same contract as the batch
  * append): their stale rows are still physical until compaction, so a
  * silent "re-add" would resurrect them beside the new row. Upsert
  * streams filter against the tombstone set or compact first.
  */
object AnnStreams {

  /** The per-batch closure for `writeStream.foreachBatch` — exposed
    * exactly as the stream runner calls it so specs (and batch
    * backfills) can drive single batches directly. */
  def annIngestSink(dir: String)(batch: DataFrame, batchId: Long): Unit =
    Similarity.assignForIngest(batch.sparkSession, dir, batch)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/delta/ingest_batch=$batchId")
}
