package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.operators.MediaCodec
import graft.operators.MediaCodec.Payload

/** Pins the REAL JDK codec paths (q101/q102): PNG and WAV round trips are
  * lossless, features match hand-computed values, RGB payloads take the
  * luminance path, and undecodable bytes are dropped rather than crashing
  * the stage. */
class MediaCodecSpec extends SpecBase {
  import spark.implicits._

  test("PNG round trip is lossless: decoded grid means equal raster arithmetic") {
    val ids = Seq(0L, 1L, 7L, 12345L).toDF("id")
    val media = MediaCodec.renderPng(spark, ids, w = 16, h = 16)
    val feats = MediaCodec.imageGridFeatures(spark, media, grid = 4).collect()
    assert(feats.length == 4 * 16)
    assert(feats.forall(f => f.width == 16 && f.height == 16))
    for (f <- feats) {
      val cy = f.cell / 4; val cx = f.cell % 4
      var sum = 0L
      for (y <- cy * 4 until cy * 4 + 4; x <- cx * 4 until cx * 4 + 4)
        sum += MediaCodec.pixel(f.id, x, y)
      assert(f.mean_lum == sum.toDouble / 16,
        s"cell ${f.cell} of id ${f.id}: got ${f.mean_lum}, want ${sum.toDouble / 16}")
    }
  }

  test("decoder handles RGB payloads (band-average luminance) and odd sizes") {
    // A 10x6 TYPE_INT_RGB image — not the synthetic gray path: proves the
    // decoder is a general ImageIO consumer, not a round-trip-only toy.
    val img = new BufferedImage(10, 6, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 10)
      img.setRGB(x, y, ((x * 20) << 16) | ((y * 30) << 8) | 40)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    val media = Seq(Payload(5L, out.toByteArray)).toDS()
    val feats = MediaCodec.imageGridFeatures(spark, media, grid = 2).collect()
    assert(feats.length == 4)
    assert(feats.forall(f => f.width == 10 && f.height == 6))
    // cell 0 covers x in [0,4], y in [0,2] (cw=5, ch=3)
    val c0 = feats.find(_.cell == 0).get
    var sum = 0.0
    for (y <- 0 until 3; x <- 0 until 5) sum += (x * 20 + y * 30 + 40) / 3.0
    assert(math.abs(c0.mean_lum - sum / 15) < 1e-9)
  }

  test("BMP payloads decode through the same path (format-agnostic consumer)") {
    // ImageIO sniffs the container from the bytes — the decoder never
    // branches on format; a 24-bit BMP (also lossless) must produce the
    // same features as its PNG twin
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, (x * 30 << 16) | (y * 30 << 8) | ((x + y) * 15))
    val png = new ByteArrayOutputStream(); ImageIO.write(img, "png", png)
    val bmp = new ByteArrayOutputStream(); ImageIO.write(img, "bmp", bmp)
    assert(!png.toByteArray.sameElements(bmp.toByteArray))
    val media = Seq(Payload(1L, png.toByteArray), Payload(2L, bmp.toByteArray)).toDS()
    val feats = MediaCodec.imageGridFeatures(spark, media, grid = 2).collect()
    val byId = feats.groupBy(_.id)
    assert(byId(1L).map(f => (f.cell, f.mean_lum)).toSet ==
      byId(2L).map(f => (f.cell, f.mean_lum)).toSet,
      "lossless containers must decode to identical features")
  }

  test("undecodable image payloads are dropped, not fatal") {
    // a TRUNCATED png is the harder case: the PNG reader claims the
    // stream (magic bytes intact) and then throws mid-decode — that must
    // drop the row like the no-reader case, not kill the task
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    val truncated = out.toByteArray.take(out.size() / 2)
    val media = Seq(
      Payload(1L, Array[Byte](1, 2, 3, 4)),
      Payload(2L, "not a png at all".getBytes("UTF-8")),
      Payload(3L, truncated)).toDS()
    assert(MediaCodec.imageGridFeatures(spark, media, grid = 4).count() == 0)
  }

  test("WAV round trip through AudioSystem recovers exact PCM features") {
    val ids = Seq(0L, 3L, 999L).toDF("id")
    val media = MediaCodec.renderWav(spark, ids, n = 1024, sampleRate = 8000)
    val feats = MediaCodec.audioFrameFeatures(spark, media, window = 256).collect()
    assert(feats.length == 3 * 4)
    assert(feats.forall(_.n_samples == 1024L))
    for (f <- feats) {
      val start = f.frame * 256
      var sumSq = 0L; var zc = 0L
      for (t <- start until start + 256) {
        val v = MediaCodec.sample(f.id, t)
        sumSq += v.toLong * v
        if (t > start && MediaCodec.sample(f.id, t - 1) * v < 0) zc += 1
      }
      assert(f.mean_square == sumSq.toDouble / 256)
      assert(f.zero_cross == zc)
    }
  }

  test("AIFF payloads decode through the big-endian branch with identical features") {
    // AIFF stores PCM big-endian; AudioSystem reports it via
    // fmt.isBigEndian and the decoder must flip byte order — the branch
    // a WAV-only test never executes. Same samples → same features.
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioFileFormat, AudioSystem}
    val n = 512
    val pcmBE = java.nio.ByteBuffer.allocate(n * 2).order(java.nio.ByteOrder.BIG_ENDIAN)
    for (t <- 0 until n) pcmBE.putShort(MediaCodec.sample(42L, t).toShort)
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, true)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcmBE.array()), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.AIFF, out)

    val wav = MediaCodec.renderWav(spark, Seq(42L).toDF("id"), n = 512, sampleRate = 8000)
    val aiff = Seq(Payload(42L, out.toByteArray)).toDS()
    def feats(m: org.apache.spark.sql.Dataset[Payload]) =
      MediaCodec.audioFrameFeatures(spark, m, window = 256)
        .collect().map(f => (f.frame, f.mean_square, f.zero_cross)).toSet
    assert(feats(aiff) == feats(wav),
      "big-endian AIFF must decode to the same features as little-endian WAV")
  }

  test("non-WAV audio payloads are dropped, not fatal") {
    val media = Seq(Payload(1L, Array.fill[Byte](64)(0x41))).toDS()
    assert(MediaCodec.audioFrameFeatures(spark, media, window = 256).count() == 0)
  }

  test("animated-GIF round trip: sampled frames recover exact pixel arithmetic") {
    val ids = Seq(0L, 3L, 99999L).toDF("id")
    val media = MediaCodec.renderGif(spark, ids, w = 16, h = 16, nFrames = 8)
    val feats = MediaCodec.videoFrameFeatures(spark, media, stride = 2).collect()
    // every 2nd of 8 frames, per id
    assert(feats.length == 3 * 4)
    assert(feats.forall(_.n_frames == 8))
    assert(feats.map(_.frame).toSet == Set(0, 2, 4, 6))
    for (f <- feats) {
      var sum = 0L
      for (y <- 0 until 16; x <- 0 until 16)
        sum += MediaCodec.framePixel(f.id, f.frame, x, y)
      assert(f.mean_lum == sum.toDouble / 256,
        s"frame ${f.frame} of id ${f.id}: got ${f.mean_lum}, want ${sum.toDouble / 256}")
    }
  }

  test("stride 1 decodes every frame; a single-frame payload is an n_frames=1 video") {
    val media = MediaCodec.renderGif(spark, Seq(5L).toDF("id"), w = 8, h = 8, nFrames = 3)
    assert(MediaCodec.videoFrameFeatures(spark, media, stride = 1)
      .collect().map(_.frame).sorted.toSeq == Seq(0, 1, 2))
    // a plain single-image GIF through the same consumer
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 8; x <- 0 until 8) img.getRaster.setSample(x, y, 0, 77)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "gif", out)
    val single = Seq(Payload(9L, out.toByteArray)).toDS()
    val got = MediaCodec.videoFrameFeatures(spark, single, stride = 2).collect()
    assert(got.length == 1 && got.head.n_frames == 1 && got.head.mean_lum == 77.0)
  }

  test("truncated GIF sequences drop the row, not the task") {
    val full = MediaCodec.renderGif(spark, Seq(11L).toDF("id"), w = 16, h = 16, nFrames = 8)
      .collect().head.media
    // cut mid-sequence: the reader claims the stream, then fails searching
    // frames or decoding one — either way the row drops
    val truncated = java.util.Arrays.copyOf(full, full.length / 3)
    val media = Seq(Payload(11L, truncated), Payload(12L, Array.fill[Byte](32)(0x13))).toDS()
    val got = MediaCodec.videoFrameFeatures(spark, media, stride = 1).collect()
    assert(got.forall(_.id != 12L), "claimed-by-no-reader payload must drop")
    // the truncated payload may yield its intact prefix frames or nothing,
    // but never throws; any features it does yield are exact
    got.filter(_.id == 11L).foreach { f =>
      var sum = 0L
      for (y <- 0 until 16; x <- 0 until 16)
        sum += MediaCodec.framePixel(11L, f.frame, x, y)
      assert(f.mean_lum == sum.toDouble / 256)
    }
  }
}
