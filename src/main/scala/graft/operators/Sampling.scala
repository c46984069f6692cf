package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling kernels shared by the batch curation queries
  * (q69/q72) and the streaming twin ([[graft.streaming.DocumentStreams]]).
  *
  * Membership is a pure hash of the row key — never rand(), which breaks
  * task-retry determinism and rerun/backfill stability. The hash reads the
  * first 8 md5 hex chars as an unsigned 32-bit int so any oracle engine
  * can replay membership exactly.
  */
object Sampling {

  /** Portable 32-bit key hash (md5-prefix). */
  def docHash32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Mixing rate in eighths per language stratum: en 4/8, mid-tier
    * languages 2/8, long tail 1/8. */
  def mixingRate8(lang: Column): Column =
    when(lang === "en", 4L)
      .when(lang.isin("zh", "es", "de", "fr"), 2L)
      .otherwise(1L)

  /** Keep-predicate for the stratified sample. */
  def stratifiedKeep(key: Column, lang: Column): Column =
    docHash32(key) % 8 < mixingRate8(lang)

  /** Salted per-purpose draw: decorrelates this decision from every other
    * docHash32 use of the same key (q69 mixing, q82 sharding, q94 split
    * all draw independently this way). */
  def saltedHash32(key: Column, salt: String): Column =
    docHash32(concat(key.cast("string"), lit(":" + salt)))

  /** Deterministic train/val/test assignment from a CONTENT hash (never a
    * row id: exact duplicates must land in one split, or held-out docs
    * leak into training through their copies). Hash-bucketing also keeps
    * assignments stable as the corpus grows — new docs get labels, old
    * labels never move — which row-number/percentile splits cannot do.
    * The ":split" salt decorrelates this draw from every other
    * docHash32-based decision (sampling, sharding) on the same key.
    */
  def holdoutSplit(contentHash: Column, valPermille: Int, testPermille: Int): Column = {
    val b = saltedHash32(contentHash, "split") % 1000
    // a NULL content hash (contentless doc) must not dodge into the
    // small held-out splits through the otherwise-branch: route it to
    // train, where a contentless row can leak nothing
    when(contentHash.isNull, "train")
      .when(b < 1000 - valPermille - testPermille, "train")
      .when(b < 1000 - testPermille, "val")
      .otherwise("test")
  }
}
