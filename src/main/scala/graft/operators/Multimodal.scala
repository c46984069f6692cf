package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.C): media as opaque binary
  * columns plus a typed metadata struct, with decode/feature-extract as
  * partition-batched functions.
  *
  * This module's decode step is a deterministic byte-fold STUB (clearly
  * marked below) so q32 can carry a full DuckDB oracle over arbitrary
  * payloads; the REAL codec paths live in [[MediaCodec]] — JDK
  * `javax.imageio` (PNG/JPEG/BMP/GIF) and `javax.sound.sampled` (PCM WAV)
  * decoding, hash-oracled end to end by q101/q102. Everything here —
  * schema, batching shape, partition-level iteration, explode-based frame
  * sampling — is the same Spark plumbing those codec-backed paths use
  * (only video remains stub-only: the JDK ships no video codec).
  */
object Multimodal {

  case class MediaRow(id: Long, media: Array[Byte], format: String, n_bytes: Long)
  case class MediaFeatures(id: Long, n_bytes: Long, features: Array[Float])

  /** Wrap a text corpus as a media table: binary payload + metadata struct.
    * (Real pipelines read the bytes from object storage; binary is binary.) */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("txt").as("format"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  /** Columnar feature extraction — the fake fold as a native codegen'd
    * expression ([[graft.functions.expressions.MediaFeatureFold]]), so
    * the stub costs q32 no whole-stage-codegen break. A REAL decoder
    * cannot run columnar (codec/model init is per partition) and swaps in
    * through [[extractFeaturesPartitioned]]; MultimodalSpec pins the two
    * paths bit-equal so the swap is behavior-preserving by construction. */
  def extractFeatures(media: DataFrame, dim: Int = 8): DataFrame =
    media.select(
      col("id"),
      col("meta.n_bytes").as("n_bytes"),
      graft.functions.expressions.MediaFeatureFold(col("media"), dim).as("features"))

  /** STUB decode + feature extraction — deterministic fake features from
    * the payload bytes (a real implementation decodes the media and runs a
    * feature net here; the `mapPartitions` batch shape is identical).
    *
    * Runs partition-at-a-time so a codec/model would amortize init cost
    * per partition, the same contract as `mapInPandas` batches.
    */
  def extractFeaturesPartitioned(spark: SparkSession, media: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(
      col("id"), col("media"),
      col("meta.format").as("format"), col("meta.n_bytes").as("n_bytes"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init would go here (codec handles, model weights)
        rows.map { r =>
          // null payload -> null features, matching the columnar path's
          // nullSafeEval short-circuit (the two are spec-pinned equal)
          if (r.media == null) MediaFeatures(r.id, r.n_bytes, null)
          else {
            val feats = Array.tabulate(dim) { i =>
              // ??? real decode goes here — deterministic fake instead:
              // fold payload bytes with an index-salted multiplicative
              // hash. This is the oracle-replayable PROXY only; the REAL
              // decoders live in MediaCodec.scala (q101 PNG via
              // javax.imageio, q102 WAV via javax.sound.sampled, q128
              // GIF frame sampling) — swap this body for one of those
              // when the payload format is known.
              var acc = 1125899906842597L + i
              var j = 0
              while (j < r.media.length) { acc = acc * 31 + r.media(j); j += 1 }
              ((acc & 0xFFFFL).toFloat / 65535.0f)
            }
            MediaFeatures(r.id, r.n_bytes, feats)
          }
        }
      }
  }

  /** STUB resize: shrink the payload by an integer factor (every k-th
    * byte — a real implementation decodes, scales with a codec, and
    * re-encodes; the partition-batched contract and the metadata update
    * are exactly what that swap needs). Output rows carry the new payload
    * plus recomputed n_bytes so downstream operators see a consistent
    * media table. */
  def resize(spark: SparkSession, media: DataFrame, factor: Int): DataFrame = {
    import spark.implicits._
    require(factor >= 1, "resize factor must be >= 1")
    val rows = media.select(
      col("id"), col("media"),
      col("meta.format").as("format"), col("meta.n_bytes").as("n_bytes"))
      .as[MediaRow]
      .mapPartitions { it =>
        // per-partition init would go here (codec handles)
        it.map { r =>
          if (r.media == null) MediaRow(r.id, null, r.format, 0L)
          else {
            val out = new Array[Byte]((r.media.length + factor - 1) / factor)
            var i = 0
            while (i < out.length) { out(i) = r.media(i * factor); i += 1 }
            MediaRow(r.id, out, r.format, out.length.toLong)
          }
        }
      }
    rows.select(
      col("id"), col("media"),
      struct(col("format"), col("n_bytes")).as("meta"))
  }

  /** Frame sampling: cut the payload into `n` fixed-size chunks ("frames")
    * — explode-based, so each frame is its own row downstream (the shape
    * video frame extraction produces). Pure column expressions. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"sampleFrames: n must be >= 1, got $n") // like resize's factor
    val len = octet_length(col("media"))
    val chunk = greatest((len / n).cast("int"), lit(1))
    media.select(
      col("id"),
      posexplode(transform(sequence(lit(0), lit(n - 1)),
        i => substring(col("media"), (i * chunk + 1).cast("int"), chunk.cast("int")))))
      .toDF("id", "frame_idx", "frame_bytes")
      .filter(octet_length(col("frame_bytes")) > 0)
  }
}
