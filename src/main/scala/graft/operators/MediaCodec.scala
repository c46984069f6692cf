package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** REAL media codecs over binary columns — no stubs.
  *
  * The container has no external image/audio libraries, but the JDK itself
  * ships real codecs: `javax.imageio` decodes/encodes PNG, JPEG, BMP and
  * GIF, and `javax.sound.sampled` parses WAV/AIFF/AU PCM. This module uses
  * them to give the multimodal family (SURVEY.md §2.C, reference payloads
  * srm_etl-style binary blobs) genuine decode paths alongside the
  * partition-batched plumbing in [[Multimodal]]:
  *
  *  - images: encode deterministic rasters to PNG, decode ANY
  *    ImageIO-supported payload back to pixels, and reduce to per-grid-cell
  *    mean-luminance features;
  *  - audio: build canonical 16-bit PCM WAV payloads, decode them through
  *    `AudioSystem` (header parse + sample extraction), and reduce to
  *    per-window energy/zero-crossing features.
  *
  * Both PNG and PCM WAV are LOSSLESS, so decode(encode(x)) == x exactly.
  * That property is what lets q101/q102 carry full DuckDB hash oracles:
  * the oracle replays the deterministic payload arithmetic and the
  * feature reduction in SQL, and the gate then proves the JVM codec
  * round-trip is bit-faithful — a far stronger check than pinning a fake.
  *
  * Everything runs `mapPartitions` so per-partition codec init amortizes
  * (ImageIO reader lookup, audio stream plumbing) — the same batch
  * contract a JNI codec or `mapInPandas` decode would use.
  */
object MediaCodec {

  // ImageIO defaults to DISK-backed stream caching — a temp file per
  // encode/decode call. Pure-memory payloads never want that; flip it
  // once per executor JVM (first task to touch the codec wins; the
  // setting is a JVM-global toggle, not per-stream state).
  private lazy val imageIoMemoryOnly: Unit = ImageIO.setUseCache(false)

  case class Payload(id: Long, media: Array[Byte])
  case class ImageCellFeature(id: Long, width: Int, height: Int, cell: Int, mean_lum: Double)
  case class AudioFrameFeature(id: Long, n_samples: Long, frame: Int, mean_square: Double, zero_cross: Long)
  case class VideoFrameFeature(id: Long, n_frames: Int, frame: Int, mean_lum: Double)

  /** Deterministic gray value for pixel (x, y) of image `id` — replayable
    * in any SQL engine as `(id*31 + x*7 + y*13) % 256`. */
  def pixel(id: Long, x: Int, y: Int): Int =
    java.lang.Math.floorMod(id * 31L + x * 7L + y * 13L, 256L).toInt

  /** Deterministic 16-bit PCM sample `t` of clip `id` — replayable as
    * `(id*131 + t*31) % 2003 - 1001` (range [-1001, 1001]). */
  def sample(id: Long, t: Int): Int =
    (java.lang.Math.floorMod(id * 131L + t * 31L, 2003L) - 1001L).toInt

  /** Render one deterministic w×h 8-bit grayscale PNG per input id using
    * the JDK's real PNG encoder. `ids` must have a LongType column `id`. */
  def renderPng(spark: SparkSession, ids: DataFrame, w: Int, h: Int): Dataset[Payload] = {
    import spark.implicits._
    ids.select(col("id").cast("long")).as[Long].mapPartitions { it =>
      imageIoMemoryOnly // per-partition codec init: memory-backed streams
      it.map { id =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, pixel(id, x, y)); x += 1 }
          y += 1
        }
        val out = new ByteArrayOutputStream(w * h / 2)
        ImageIO.write(img, "png", out)
        Payload(id, out.toByteArray)
      }
    }
  }

  /** REAL image decode: any ImageIO-supported payload (PNG/JPEG/BMP/GIF)
    * to per-grid-cell mean luminance. Gray payloads use the raster band
    * directly (integer luminance, so cell means over power-of-two cells
    * are exact doubles); RGB payloads average the three bands.
    * Undecodable payloads are dropped (a real pipeline's dead-letter
    * path would collect them; count via n_input - n_output). */
  def imageGridFeatures(spark: SparkSession, media: Dataset[Payload], grid: Int): Dataset[ImageCellFeature] = {
    import spark.implicits._
    media.mapPartitions { it =>
      imageIoMemoryOnly // per-partition codec init: memory-backed streams
      it.flatMap { p =>
        // null = no registered reader claims the bytes; a reader that
        // CLAIMS the stream but chokes mid-decode (truncated PNG) throws
        // instead — both are "undecodable payload", both drop the row
        val img =
          try ImageIO.read(new ByteArrayInputStream(p.media))
          catch { case _: java.io.IOException => null }
        if (img == null) Iterator.empty
        else {
          val w = img.getWidth
          val h = img.getHeight
          val raster = img.getRaster
          val bands = raster.getNumBands
          val cw = math.max(w / grid, 1)
          val ch = math.max(h / grid, 1)
          val sums = new Array[Double](grid * grid)
          val counts = new Array[Long](grid * grid)
          var y = 0
          while (y < h) {
            val cy = math.min(y / ch, grid - 1)
            var x = 0
            while (x < w) {
              val cell = cy * grid + math.min(x / cw, grid - 1)
              val lum =
                if (bands >= 3)
                  (raster.getSample(x, y, 0) + raster.getSample(x, y, 1) + raster.getSample(x, y, 2)) / 3.0
                else raster.getSample(x, y, 0).toDouble
              sums(cell) += lum
              counts(cell) += 1
              x += 1
            }
            y += 1
          }
          (0 until grid * grid).iterator.map { c =>
            ImageCellFeature(p.id, w, h, c, if (counts(c) == 0) 0.0 else sums(c) / counts(c))
          }
        }
      }
    }
  }

  /** Deterministic gray value for pixel (x, y) of frame `f` of clip `id` —
    * replayable as `(id*31 + f*17 + x*7 + y*13) % 256`. */
  def framePixel(id: Long, f: Int, x: Int, y: Int): Int =
    java.lang.Math.floorMod(id * 31L + f * 17L + x * 7L + y * 13L, 256L).toInt

  /** 256-entry grayscale palette: index i maps to (i, i, i), so an indexed
    * raster's palette INDEX is its gray value — the property that makes
    * the GIF round trip bit-exact (GIF stores the color table verbatim). */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate[Byte](256)(i => i.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** Render one deterministic multi-frame (animated) GIF per id — the
    * VIDEO payload: a real frame sequence through the JDK's real GIF
    * sequence encoder (`prepareWriteSequence`/`writeToSequence`). Frames
    * are full-size 8-bit indexed rasters over [[grayPalette]], so every
    * pixel of every frame round-trips exactly. */
  def renderGif(spark: SparkSession, ids: DataFrame, w: Int, h: Int, nFrames: Int): Dataset[Payload] = {
    import spark.implicits._
    ids.select(col("id").cast("long")).as[Long].mapPartitions { it =>
      imageIoMemoryOnly
      val palette = grayPalette
      it.map { id =>
        val out = new ByteArrayOutputStream(w * h * nFrames / 4)
        val writer = ImageIO.getImageWritersByFormatName("gif").next()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nFrames) {
            val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, palette)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { raster.setSample(x, y, 0, framePixel(id, f, x, y)); x += 1 }
              y += 1
            }
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
        } finally {
          writer.dispose()
          ios.close()
        }
        Payload(id, out.toByteArray)
      }
    }
  }

  /** REAL video decode + FRAME SAMPLING: open any multi-frame
    * ImageIO-supported payload (animated GIF here — the one genuine
    * frame-sequence codec the JDK ships), count its frames, decode every
    * `stride`-th frame and reduce each to mean luminance. This replaces
    * the multimodal family's last stub: the frame-sample step of the
    * q32 plumbing now exercises a real container with real inter-frame
    * structure. Undecodable payloads drop (dead-letter posture, same as
    * images/audio); single-frame payloads are just n_frames=1 videos. */
  def videoFrameFeatures(spark: SparkSession, media: Dataset[Payload], stride: Int): Dataset[VideoFrameFeature] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import spark.implicits._
    media.mapPartitions { it =>
      imageIoMemoryOnly
      it.flatMap { p =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(p.media))
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); Iterator.empty }
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, /*seekForwardOnly=*/ false, /*ignoreMetadata=*/ true)
            val n = reader.getNumImages(/*allowSearch=*/ true)
            (0 until n by stride).iterator.map { f =>
              val img = reader.read(f)
              val raster = img.getRaster
              val w = img.getWidth
              val h = img.getHeight
              var sum = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
                y += 1
              }
              VideoFrameFeature(p.id, n, f, sum.toDouble / (w * h))
            }.toVector // materialize BEFORE dispose: the iterator reads lazily
          } catch {
            // claimed-but-corrupt stream: the JDK GIF reader throws
            // RUNTIME exceptions (AIOOBE / NegativeArraySize) on mangled
            // LZW bodies, not just IOException — dead-letter either way,
            // the task must survive a bad payload
            case scala.util.control.NonFatal(_) => Vector.empty
          } finally {
            reader.dispose()
            iis.close()
          }
        }
      }
    }
  }

  /** Build one canonical 44-byte-header mono 16-bit little-endian PCM WAV
    * per id, with `n` deterministic samples. Pure byte construction — the
    * REAL codec work is on the decode side. */
  def renderWav(spark: SparkSession, ids: DataFrame, n: Int, sampleRate: Int): Dataset[Payload] = {
    import spark.implicits._
    ids.select(col("id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val dataBytes = n * 2
        val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
          .put("WAVE".getBytes("US-ASCII"))
        bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1) // PCM
          .putShort(1) // mono
          .putInt(sampleRate)
          .putInt(sampleRate * 2) // byte rate
          .putShort(2)            // block align
          .putShort(16)           // bits per sample
        bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
        var t = 0
        while (t < n) { bb.putShort(sample(id, t).toShort); t += 1 }
        Payload(id, bb.array())
      }
    }
  }

  /** REAL audio decode via `javax.sound.sampled`: AudioSystem parses the
    * container header (format, channels, endianness, sample width) and
    * streams PCM frames; we reduce to per-window features — mean square
    * (energy; exact for power-of-two windows) and intra-window
    * zero-crossing count. Non-PCM / undecodable payloads are dropped. */
  def audioFrameFeatures(spark: SparkSession, media: Dataset[Payload], window: Int): Dataset[AudioFrameFeature] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { p =>
        try {
          val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(p.media))
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) {
            in.close() // reject branch must still release the decoder chain
            Iterator.empty
          } else {
            val raw = in.readAllBytes()
            in.close()
            val n = raw.length / 2
            val samples = new Array[Int](n)
            val order =
              if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN
            val bb = java.nio.ByteBuffer.wrap(raw).order(order)
            var i = 0
            while (i < n) { samples(i) = bb.getShort(i * 2).toInt; i += 1 }
            val nFrames = (n + window - 1) / window
            (0 until nFrames).iterator.map { f =>
              val start = f * window
              val end = math.min(start + window, n)
              var sumSq = 0L
              var zc = 0L
              var i = start
              while (i < end) {
                val v = samples(i)
                sumSq += v.toLong * v
                if (i > start && samples(i - 1) * v < 0) zc += 1
                i += 1
              }
              AudioFrameFeature(p.id, n.toLong, f, sumSq.toDouble / (end - start), zc)
            }
          }
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => Iterator.empty
        }
      }
    }
  }
}
