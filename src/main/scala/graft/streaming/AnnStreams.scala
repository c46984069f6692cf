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
  * duplicate-free. A probe CONCURRENT with a crashed-batch REPLAY is
  * the one scoped exception: the replay replaces its own batch dir via
  * stage-and-rename (the replacement rows are written to a dot-prefixed
  * staging dir — invisible to partition discovery — then swapped in),
  * so the race window is the delete+rename instant rather than the
  * whole write, but a probe that plans its delta scan inside that
  * instant can still miss the in-flight batch or hit vanished files.
  * Replays happen only on crash recovery; pause probes across a
  * recovery if that window matters.
  *
  * Tombstoned incoming ids are DROPPED, not failed: delete wins over
  * in-flight ingest (their stale rows stay physical until compaction,
  * so a silent re-add would resurrect them), and the loud form the
  * batch appends use would WEDGE the stream — a micro-batch that
  * landed but crashed before its checkpoint commit replays after a
  * delete of one of its ids, and the replay must be able to overwrite
  * its own partition. Upsert streams therefore run delete -> compact
  * -> re-ingest, exactly like the batch path.
  */
object AnnStreams {

  /** The per-batch closure for `writeStream.foreachBatch`. The frozen
    * quantizer state (centroids + codebook) loads ONCE per sink
    * instance and serves every micro-batch — it is frozen by the
    * artifact's contract, and re-collecting it per batch would make
    * object-store metadata latency the floor of small-batch ingest.
    * Specs and batch backfills can still call the returned closure
    * directly; the tombstone set IS re-read per batch (it legitimately
    * changes between batches). */
  def annIngestSink(dir: String): (DataFrame, Long) => Unit = {
    // loaded lazily on the first batch (the sink is built before any
    // data exists to supply a session), then reused; foreachBatch
    // invocations are sequential per query so the simple guard is safe
    var frozen: Similarity.FrozenQuantizer = null
    (batch: DataFrame, batchId: Long) => {
      if (frozen == null) frozen = Similarity.loadFrozenQuantizer(batch.sparkSession, dir)
      // STAGE-AND-RENAME, not write-in-place: a replay that statically
      // overwrote its live batch dir would expose deleted files to any
      // probe that planned its delta scan just before the overwrite
      // (Sources.stageAndSwapDir narrows the race to delete+rename).
      graft.sources.Sources.stageAndSwapDir(
        s"$dir/delta/ingest_batch=$batchId",
        batch.sparkSession.sparkContext.hadoopConfiguration) { staging =>
        Similarity.assignForIngest(batch.sparkSession, dir, batch, frozen,
          dropTombstoned = true)
          .write.mode("overwrite")
          // pin STATIC overwrite per write: under a session-level dynamic
          // conf an EMPTY replay would truncate nothing and a crashed
          // attempt's partial cell files would survive
          .option("partitionOverwriteMode", "static")
          .partitionBy("cell")
          .parquet(staging)
      }
    }
  }
}
