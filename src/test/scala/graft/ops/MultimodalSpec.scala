package graft.ops

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.fromDocuments(spark,
    Tables.documents(spark, sf("sf0.001")).limit(50))

  test("extractFeatures: per-partition decode keeps schema and determinism") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.media_id)
    assert(f1.length === 50)
    assert(f1.toSeq === f2.toSeq, "features must not depend on partitioning")
    assert(f1.forall(f => f.width >= 64 && f.height >= 64 && f.n_bytes > 0))
  }

  test("extractImageFeatures REALLY decodes PNGs (JDK ImageIO); corrupt bytes degrade, not throw") {
    import spark.implicits._
    // synthesize real PNGs: solid-color images whose mean luminance is the
    // closed-form BT.601 luma of the fill color
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def luma(rgb: Int): Double =
      ((rgb >> 16) & 0xFF) * 0.299 + ((rgb >> 8) & 0xFF) * 0.587 + (rgb & 0xFF) * 0.114
    val white = 0xFFFFFF
    val teal = 0x008080
    val rows = Seq(
      Multimodal.MediaRow(1L, png(10, 20, white), "image/png"),
      Multimodal.MediaRow(2L, png(33, 7, teal), "image/png"),
      Multimodal.MediaRow(3L, Array[Byte](1, 2, 3, 4), "image/png")) // garbage
    val got = Multimodal.extractImageFeatures(rows.toDS())
      .collect().map(f => f.media_id -> f).toMap
    assert(got(1L).decoded && got(1L).width === 10 && got(1L).height === 20)
    assert(math.abs(got(1L).mean_luma - luma(white)) < 0.5)
    assert(got(2L).decoded && got(2L).width === 33 && got(2L).height === 7)
    assert(math.abs(got(2L).mean_luma - luma(teal)) < 0.5)
    assert(!got(3L).decoded && got(3L).width === -1, "corrupt payload must degrade")
  }

  test("imageAHash: solid saturates, halves are closed-form, noise holds, opposites max out") {
    import spark.implicits._
    def png(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val leftBright = png(16, 16)((x, _) => if (x < 8) 0xE0E0E0 else 0x202020)
    val rightBright = png(16, 16)((x, _) => if (x >= 8) 0xE0E0E0 else 0x202020)
    val leftNoisy = png(16, 16)((x, y) =>
      (if (x < 8) 0xE0E0E0 else 0x202020) ^ (if (x == 3 && y == 3) 0x1 else 0))
    val rows = Seq(
      Multimodal.MediaRow(1L, png(12, 9)((_, _) => 0x808080), "image/png"), // solid
      Multimodal.MediaRow(2L, leftBright, "image/png"),
      Multimodal.MediaRow(3L, rightBright, "image/png"),
      Multimodal.MediaRow(4L, leftNoisy, "image/png"),
      Multimodal.MediaRow(5L, png(4, 4)((_, _) => 0x808080), "image/png"), // too small
      Multimodal.MediaRow(6L, Array[Byte](9, 9, 9), "image/png")) // garbage
    val got = Multimodal.imageAHash(rows.toDS()).collect().map(h => h.media_id -> h).toMap
    // a solid image's every cell sits AT the mean → all 64 bits set
    assert(got(1L).decoded && got(1L).ahash === -1L)
    assert(got(2L).ahash === 0x0F0F0F0F0F0F0F0FL)
    assert(got(3L).ahash === 0xF0F0F0F0F0F0F0F0L)
    // one flipped pixel: hamming 0 from the original (near-dup invariance)
    assert(java.lang.Long.bitCount(got(2L).ahash ^ got(4L).ahash) === 0)
    // opposite halves disagree on every cell
    assert(java.lang.Long.bitCount(got(2L).ahash ^ got(3L).ahash) === 64)
    assert(!got(5L).decoded, "sub-8x8 images cannot carry a 64-cell hash")
    assert(!got(6L).decoded, "corrupt payload must degrade")
  }

  test("audioEnergyHash: silence saturates, halves are closed-form, formats degrade") {
    import spark.implicits._
    def wav(nFrames: Int, bits: Int = 16)(amp: Int => Short): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, bits, 1, true, false)
      val bytesPer = bits / 8
      val pcm = new Array[Byte](nFrames * bytesPer)
      if (bits == 16) {
        for (f <- 0 until nFrames) {
          val v = amp(f)
          pcm(f * 2) = (v & 0xFF).toByte
          pcm(f * 2 + 1) = ((v >> 8) & 0xFF).toByte
        }
      }
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        in, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val n = 2048
    def seg(f: Int) = f * 64 / n
    val rows = Seq(
      Multimodal.MediaRow(1L, wav(n)(_ => 0), "audio/wav"), // silence
      Multimodal.MediaRow(2L, wav(n)(f => if (seg(f) < 32) 16384 else 0), "audio/wav"),
      Multimodal.MediaRow(3L, wav(n)(f => if (seg(f) >= 32) 16384 else 0), "audio/wav"),
      Multimodal.MediaRow(4L, wav(32)(_ => 100), "audio/wav"), // under 64 frames
      Multimodal.MediaRow(5L, wav(n, bits = 8)(_ => 0), "audio/wav"), // unsupported width
      Multimodal.MediaRow(6L, Array[Byte](1, 2, 3), "audio/wav")) // garbage
    val got = Multimodal.audioEnergyHash(rows.toDS()).collect().map(h => h.media_id -> h).toMap
    // zero-dynamics clip: every segment sits at the (zero) mean → saturate
    assert(got(1L).decoded && got(1L).ehash === -1L)
    assert(got(2L).ehash === 4294967295L)
    assert(got(3L).ehash === -4294967296L)
    assert(java.lang.Long.bitCount(got(2L).ehash ^ got(3L).ehash) === 64)
    assert(!got(4L).decoded, "clips under 64 frames cannot fill the envelope")
    assert(!got(5L).decoded, "non-16-bit encodings must degrade, not guess")
    assert(!got(6L).decoded, "corrupt payload must degrade")
  }

  test("extractAudioFeatures REALLY decodes WAV headers (JDK sound API)") {
    import spark.implicits._
    def wav(sampleRate: Float, channels: Int, nFrames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels, true, false)
      val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        in, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, wav(8000f, 1, 4000), "audio/wav"),
      Multimodal.MediaRow(2L, wav(44100f, 2, 441), "audio/wav"),
      Multimodal.MediaRow(3L, "not audio".getBytes, "audio/wav"))
    val got = Multimodal.extractAudioFeatures(rows.toDS())
      .collect().map(f => f.media_id -> f).toMap
    assert(got(1L).decoded && got(1L).sample_rate === 8000.0
      && got(1L).channels === 1 && got(1L).n_frames === 4000L)
    assert(got(2L).decoded && got(2L).sample_rate === 44100.0 && got(2L).channels === 2)
    assert(!got(3L).decoded)
  }

  test("resizeStub bounds payload size and tags the mime") {
    val resized = Multimodal.resizeStub(media, maxBytes = 100).collect()
    assert(resized.forall(_.payload.length <= 100))
    assert(resized.forall(_.mime.endsWith(";resized")))
  }

  test("resizeImage: real raster downscale — dims exact, solid color bit-exact, no upscale, corrupt degrades") {
    import spark.implicits._
    def png(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val teal = 0x008080
    val rows = Seq(
      Multimodal.MediaRow(1L, png(64, 48)((_, _) => teal), "image/png"), // downscale
      Multimodal.MediaRow(2L, png(8, 6)((_, _) => teal), "image/png"),   // under maxDim: untouched dims
      Multimodal.MediaRow(3L, png(50, 10)((x, _) => if (x < 25) 0xFFFFFF else 0x000000), "image/png"),
      Multimodal.MediaRow(4L, Array[Byte](9, 9, 9), "image/png"))        // garbage
    val got = Multimodal.resizeImage(rows.toDS(), maxDim = 16)
      .collect().map(r => r.media_id -> r).toMap
    // integer dim math: 64x48 -> (16, 48*16/64=12)
    assert(got(1L).decoded && got(1L).width === 16 && got(1L).height === 12)
    assert(got(1L).orig_w === 64 && got(1L).orig_h === 48)
    // the re-encoded payload REALLY decodes to those dims, every pixel
    // the exact source color (box average of a constant is the constant)
    val back1 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(got(1L).payload))
    assert(back1.getWidth === 16 && back1.getHeight === 12)
    assert((0 until 12).forall(y => (0 until 16).forall(x =>
      (back1.getRGB(x, y) & 0xFFFFFF) === teal)), "solid color must round-trip bit-exact")
    // never upscales
    assert(got(2L).width === 8 && got(2L).height === 6)
    // a clean half-split survives a 50x10 -> 16x3 box average: the seam
    // column mixes, but the outer columns stay pure white / pure black
    val back3 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(got(3L).payload))
    assert(got(3L).width === 16 && got(3L).height === 3)
    assert((back3.getRGB(0, 1) & 0xFFFFFF) === 0xFFFFFF)
    assert((back3.getRGB(15, 1) & 0xFFFFFF) === 0x000000)
    assert(!got(4L).decoded && got(4L).width === -1 && got(4L).payload.isEmpty)
  }

  test("resampleAudio: exact NN rate mapping, stereo mixdown, round-trip, corrupt degrades") {
    import spark.implicits._
    def wav(rate: Float, channels: Int, frames: Array[Array[Short]]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
      val pcm = new Array[Byte](frames.length * channels * 2)
      for (f <- frames.indices; c <- 0 until channels) {
        val off = (f * channels + c) * 2
        pcm(off) = (frames(f)(c) & 0xFF).toByte
        pcm(off + 1) = ((frames(f)(c) >> 8) & 0xFF).toByte
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.length.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    def monoSamples(payload: Array[Byte]): Array[Short] = {
      val ain = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        assert(ain.getFormat.getChannels === 1)
        val bytes = ain.readAllBytes()
        Array.tabulate(bytes.length / 2)(i =>
          ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort)
      } finally ain.close()
    }
    val stereo = wav(8000f, 2, Array(
      Array[Short](10, 20), Array[Short](-20, -21), Array[Short](100, 100),
      Array[Short](7, 8)))
    val mono = wav(8000f, 1, Array(Array(10: Short), Array(-20: Short)))
    val rows = Seq(
      Multimodal.MediaRow(1L, stereo, "audio/wav"),
      Multimodal.MediaRow(2L, mono, "audio/wav"),
      Multimodal.MediaRow(3L, Array[Byte](5, 5), "audio/wav"))
    // downsample 2x: frames 4 -> 2, samples are source frames 0 and 2
    // after truncating mixdown ((10+20)/2=15, (-20-21)/2=-20, 100, 7)
    val down = Multimodal.resampleAudio(rows.toDS(), targetRate = 4000)
      .collect().map(r => r.media_id -> r).toMap
    assert(down(1L).decoded && down(1L).orig_rate === 8000 &&
      down(1L).orig_channels === 2 && down(1L).orig_frames === 4L)
    assert(down(1L).rate === 4000 && down(1L).frames === 2L)
    assert(monoSamples(down(1L).payload).toSeq === Seq[Short](15, 100))
    assert(!down(3L).decoded && down(3L).frames === -1L)
    // upsample 2x: NN duplicates each source frame
    val up = Multimodal.resampleAudio(rows.toDS(), targetRate = 16000)
      .collect().map(r => r.media_id -> r).toMap
    assert(up(2L).frames === 4L)
    assert(monoSamples(up(2L).payload).toSeq === Seq[Short](10, 10, -20, -20))
  }

  test("sampleGifFrames: real GIF demux — composition, offsets, disposal, stride, corrupt degrades") {
    import spark.implicits._
    def solid(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      img
    }
    def px(payload: Array[Byte], x: Int, y: Int): Int = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      img.getRGB(x, y) & 0xFFFFFF
    }
    val red = 0xFF0000; val green = 0x00FF00; val blue = 0x0000FF
    // frame 0: full 8x8 red; frame 1: 2x2 green PATCH at (4, 2) that
    // accumulates; frame 2: 2x2 blue patch at (0, 0) marked
    // restoreToPrevious (visible in ITS frame only)
    val gif = graft.queries.TextOps.animatedGif(Seq(
      (solid(8, 8, red), 0, 0, "none"),
      (solid(2, 2, green), 4, 2, "doNotDispose"),
      (solid(2, 2, blue), 0, 0, "restoreToPrevious")))
    val rows = Seq(
      Multimodal.MediaRow(1L, gif, "image/gif"),
      Multimodal.MediaRow(2L, Array[Byte](7, 7, 7, 7), "image/gif"))
    val got = Multimodal.sampleGifFrames(rows.toDS(), stride = 1)
      .collect().groupBy(_.media_id)
    val fs = got(1L).sortBy(_.frame_idx)
    assert(fs.length === 3 && fs.forall(f => f.n_frames === 3 && f.decoded))
    assert(fs.forall(f => f.width === 8 && f.height === 8))
    // frame 0: pure red everywhere
    assert(px(fs(0).payload, 0, 0) === red && px(fs(0).payload, 5, 3) === red)
    // frame 1: green patch composed OVER the red background
    assert(px(fs(1).payload, 5, 3) === green && px(fs(1).payload, 0, 0) === red)
    // frame 2: blue patch at origin, green patch still accumulated
    assert(px(fs(2).payload, 0, 0) === blue && px(fs(2).payload, 5, 3) === green)
    // corrupt payload degrades to the single undecoded row
    assert(got(2L).toSeq === Seq(
      Multimodal.VideoFrame(2L, -1, -1, -1, -1, Array.empty[Byte], decoded = false))
      || (!got(2L).head.decoded && got(2L).length === 1))
    // restoreToBackgroundColor clears the patch rect after its frame
    val gif2 = graft.queries.TextOps.animatedGif(Seq(
      (solid(4, 4, red), 0, 0, "none"),
      (solid(2, 2, green), 1, 1, "restoreToBackgroundColor"),
      (solid(1, 1, blue), 3, 3, "doNotDispose")))
    val fs2 = Multimodal.sampleGifFrames(
        Seq(Multimodal.MediaRow(3L, gif2, "image/gif")).toDS(), stride = 1)
      .collect().sortBy(_.frame_idx)
    assert(px(fs2(1).payload, 1, 1) === green)
    assert(px(fs2(2).payload, 1, 1) === 0x000000, "disposed rect must clear to background")
    assert(px(fs2(2).payload, 3, 3) === blue)
    // stride 2 samples frames 0 and 2 only
    val strided = Multimodal.sampleGifFrames(
        Seq(Multimodal.MediaRow(1L, gif, "image/gif")).toDS(), stride = 2)
      .collect().map(_.frame_idx).sorted
    assert(strided.toSeq === Seq(0, 2))
  }

  test("frameSampleStub fans a payload out to strided frames with keyable ids") {
    val frames = Multimodal.frameSampleStub(media, frameBytes = 64, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.payload.length <= 64))
    // frame index recoverable; originals recoverable
    val parents = frames.map(_.media_id / 1000000L).distinct
    assert(parents.length === 50)
    assert(frames.forall(f => (f.media_id % 1000000L) % 2 == 0), "stride 2 → even frames only")
  }
}
