package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns beside typed metadata; decode / feature-extraction runs
  * per-partition so one task amortizes decoder setup over a whole batch —
  * the Spark-side shape that matters at 100 TB (payloads never hit the
  * driver, partitions bound memory).
  *
  * Codecs: IMAGE ([[extractImageFeatures]]) and AUDIO
  * ([[extractAudioFeatures]]) decode is REAL — the JDK ships codecs as
  * Java SE APIs (`javax.imageio`: PNG/JPEG/BMP/GIF; `javax.sound.sampled`:
  * WAV/AIFF/AU), no external library needed; undecodable payloads degrade
  * to a flagged row, never an exception (a 100 TB corpus always contains
  * corrupt bytes). VIDEO frame sampling stays a byte-range STUB
  * ([[frameSampleStub]]) — the JDK has no container demuxer — and
  * [[decodeStub]] remains the deterministic fake used by the q30 oracle
  * (the synthetic corpus has no real media to decode).
  */
object Multimodal {

  // Memory-backed ImageIO streams, JVM-wide (r19, guide §1.2 per-task
  // work): with the default `useCache=true`, EVERY ImageIO.read/write of
  // an in-memory payload spins up a FileCache stream — a temp FILE create
  // + write + delete per image. Single-task that is slow; under a
  // full-width decode stage all cores contend on the same temp directory
  // and the codec work serializes behind filesystem metadata locks (the
  // q71/q180 spread regression measured exactly that). In-memory streams
  // are strictly correct for byte-array payloads of bounded size — the
  // only MediaRow shape in this engine. Runs at object init: every decode
  // entry point lives here, and the synth fixtures construct [[MediaRow]]
  // (nested), which initializes this object before their first encode.
  javax.imageio.ImageIO.setUseCache(false)

  /** Cached JDK audio SPI providers (r19, guide §1.2): every
    * `AudioSystem.*` entry point funnels through
    * `JDK13Services.getProviders` — a `static synchronized` JVM-global
    * registry lookup taken PER CALL — so a full-width audio decode stage
    * serializes on one lock (measured: q182 spread 32-way ran ~2.5×
    * SLOWER than the same work single-task). `javax.sound.sampled.spi`
    * is public API and the JDK's readers/writers are stateless; load
    * them once per JVM and dispatch directly — the SAME codec objects
    * `AudioSystem` would pick, without the global lock.
    */
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).asScala.toSeq
  }
  private lazy val audioWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).asScala.toSeq
  }

  /** `AudioSystem.getAudioInputStream` semantics over the cached
    * providers: first reader that accepts the payload wins; a fresh
    * ByteArrayInputStream per attempt stands in for the mark/reset
    * contract. Throws `UnsupportedAudioFileException` like the original
    * when nothing matches (callers' degrade paths are unchanged).
    */
  private[graft] def audioInput(payload: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val it = audioReaders.iterator
    while (it.hasNext) {
      val r = it.next()
      try return r.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no cached provider accepts the payload")
  }

  /** `AudioSystem.write(ain, WAVE, out)` over the cached providers. */
  private[graft] def writeWave(
      ain: javax.sound.sampled.AudioInputStream, out: java.io.OutputStream): Int = {
    val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    audioWriters.find(_.isFileTypeSupported(wave, ain)) match {
      case Some(w) => w.write(ain, wave, out)
      case None => throw new IllegalArgumentException(
        "no cached provider writes WAVE for this stream")
    }
  }

  final case class MediaRow(media_id: Long, payload: Array[Byte], mime: String)
  final case class MediaFeatures(
      media_id: Long, n_bytes: Int, width: Int, height: Int, checksum: Long)
  final case class ImageFeatures(
      media_id: Long, n_bytes: Int, width: Int, height: Int,
      mean_luma: Double, decoded: Boolean)
  final case class AudioFeatures(
      media_id: Long, n_bytes: Int, sample_rate: Double, channels: Int,
      n_frames: Long, decoded: Boolean)

  /** STUB decoder: stands in for an image/audio decode. Deterministic pure
    * function of the payload so tests and oracles can pin it. A real build
    * swaps only this function for a codec call; the surrounding plumbing
    * (mapPartitions, schema, batch iteration) is production-shaped.
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.payload.length
    // same polynomial checksum as the native rolling_hash expression
    val acc = graft.functions.RollingHash.hashBytes(r.payload)
    MediaFeatures(r.media_id, n,
      width = 64 + java.lang.Math.floorMod(acc, 512L).toInt,
      height = 64 + java.lang.Math.floorMod(acc >> 9, 512L).toInt,
      checksum = acc)
  }

  /** Per-partition decode: one decoder "session" per partition (the `iter`
    * closure is where a real codec would init once), constant memory per
    * row batch.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      // real codecs would initialize here, once per partition
      iter.map(decodeStub)
    }
  }

  /** REAL image decode (JDK `javax.imageio`): dimensions + mean luminance
    * over a bounded 32×32 sample grid, so feature cost is O(1) per image
    * regardless of resolution. ImageIO readers are looked up per call from
    * a JVM-wide registry (the per-partition closure is still where an
    * expensive codec would be held); corrupt or non-image payloads yield
    * `decoded = false` rows with −1 dimensions instead of failing the task.
    */
  /** Shared decode + degrade scaffolding: one place to own the ImageIO
    * lookup, the null-reader result, and the catch-all (three extractors
    * repeated it before r12's review). None = undecodable payload.
    */
  private def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  def extractImageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      iter.map { r =>
        val undecoded = ImageFeatures(r.media_id, r.payload.length, -1, -1, -1.0, decoded = false)
        decodeImage(r.payload) match {
          case None => undecoded
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            val (stepX, stepY) = (math.max(1, w / 32), math.max(1, h / 32))
            var (sum, n, y) = (0.0, 0, 0)
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sum += ((rgb >> 16) & 0xFF) * 0.299 + ((rgb >> 8) & 0xFF) * 0.587 +
                  (rgb & 0xFF) * 0.114
                n += 1; x += stepX
              }
              y += stepY
            }
            ImageFeatures(r.media_id, r.payload.length, w, h, sum / n, decoded = true)
        }
      }
    }
  }

  /** Exact decode probe: dimensions + the (0,0) pixel's channels as
    * integers — the hash-gate-friendly face of the real image decoder
    * (q71 round-trips generated PNGs through ImageIO and the oracle
    * recomputes the integers in closed form; float features like
    * mean_luma stay spec-tested where epsilon is tolerable).
    */
  final case class ImageProbe(
      media_id: Long, width: Int, height: Int, r: Int, g: Int, b: Int, decoded: Boolean)

  def probeImages(media: Dataset[MediaRow]): Dataset[ImageProbe] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      iter.map { m =>
        decodeImage(m.payload) match {
          case None => ImageProbe(m.media_id, -1, -1, -1, -1, -1, decoded = false)
          case Some(img) =>
            val rgb = img.getRGB(0, 0)
            ImageProbe(m.media_id, img.getWidth, img.getHeight,
              (rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF, decoded = true)
        }
      }
    }
  }

  /** Perceptual AVERAGE-HASH (aHash) of a decoded image: 8×8 luma grid,
    * each cell thresholded against the global mean, packed into 64 bits
    * (bit `row·8 + col`). Near-identical images — recompression, small
    * noise, minor edits — land within a few hamming bits, so the image
    * near-dup path reuses the SimHash bucketing machinery (q181) — pass
    * `sigBits = 64` so the bands shard on the full signature width.
    * The image-side sibling of the text fingerprint: 100 TB of media
    * dedups by 8-byte signatures, never by payload comparison.
    *
    * DEGENERATE INPUTS are the caller's pre-filter, exactly as with
    * text fingerprints: undecodable payloads carry `decoded = false`
    * (and `ahash = 0`), and any ZERO-CONTRAST image — solid black,
    * solid white, letterboxing, blank pages — saturates to
    * `ahash == -1L` (every cell sits at the global mean; this is
    * inherent to average-hashing, which sees contrast structure, not
    * brightness). Drop both classes before banding
    * (`filter($"decoded" && $"ahash" =!= -1L)`) or every corrupt/flat
    * image becomes a mutual hamming-0 "duplicate" in one quadratic hot
    * bucket.
    *
    * INTEGER-EXACT end to end: luma is the fixed-point 299/587/114
    * millirate, the threshold compares `cellSum·nSampled ≥
    * totalSum·cellCount` (cross-multiplied — no float division), and
    * pixels are sampled on a ≤64×64 stride grid (ceil-division strides)
    * so cost is O(1) per image and the products stay far inside 64-bit
    * range at any resolution. Deterministic, so the q180 gate pins REAL
    * PNG-encode→decode→hash round trips against closed-form expected
    * signatures. Images smaller than 8×8 (or undecodable payloads)
    * degrade to `decoded = false`, never an exception.
    */
  final case class ImageHash(media_id: Long, ahash: Long, decoded: Boolean)

  def imageAHash(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      iter.map { m =>
        val undecoded = ImageHash(m.media_id, 0L, decoded = false)
        // the filter folds "decodable but below the 64-cell floor" into
        // the undecoded degrade
        decodeImage(m.payload).filter(i => i.getWidth >= 8 && i.getHeight >= 8) match {
          case None => undecoded
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            // ceil division: floor put 65..127-px axes back at stride 1
            // (up to 127 samples) — the documented ≤64 bound was off 4×
            val (stepX, stepY) = ((w + 63) / 64, (h + 63) / 64)
            val sums = new Array[Long](64)
            val counts = new Array[Long](64)
            var y = 0
            while (y < h) {
              val cy = y * 8 / h
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val luma = 299L * ((rgb >> 16) & 0xFF) +
                  587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)
                val c = cy * 8 + x * 8 / w
                sums(c) += luma
                counts(c) += 1L
                x += stepX
              }
              y += stepY
            }
            val total = sums.sum
            val n = counts.sum
            var bits = 0L
            var c = 0
            while (c < 64) {
              if (counts(c) > 0L && sums(c) * n >= total * counts(c))
                bits |= (1L << c)
              c += 1
            }
            ImageHash(m.media_id, bits, decoded = true)
        }
      }
    }
  }

  /** Perceptual ENERGY-ENVELOPE HASH of an audio clip — [[imageAHash]]'s
    * twin for sound: 64 equal time segments, each segment's mean
    * absolute 16-bit amplitude thresholded against the clip's global
    * mean, packed into 64 bits (bit = segment index). Re-encodes, level
    * changes that preserve shape, and small edits stay within a few
    * hamming bits, so audio near-dup rides the same SimHash banding as
    * images and text. Same degenerate-input contract as the image hash:
    * undecodable/unsupported payloads carry `decoded = false`, and a
    * ZERO-DYNAMICS clip (silence, constant tone) saturates to
    * `ehash == -1L` — filter both before banding.
    *
    * INTEGER-EXACT: amplitude sums are exact Longs, the threshold
    * cross-multiplies (`segSum·nSampled ≥ totalSum·segCount`), and
    * frames are strided so at most `64·framesPerSegmentCap` frames are
    * read per clip — O(1) cost at any duration. Supports the JDK-decoded
    * PCM_SIGNED 16-bit little-endian family (what `AudioSystem` yields
    * for WAV); other encodings degrade rather than guess. Clips under
    * 64 frames cannot fill the envelope and degrade too.
    */
  final case class AudioHash(media_id: Long, ehash: Long, decoded: Boolean)

  def audioEnergyHash(
      media: Dataset[MediaRow], framesPerSegmentCap: Int = 256): Dataset[AudioHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      iter.map { m =>
        val undecoded = AudioHash(m.media_id, 0L, decoded = false)
        try {
          val ain = audioInput(m.payload)
          try {
            val fmt = ain.getFormat
            val frames = ain.getFrameLength
            if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16 || fmt.isBigEndian || frames < 64L) undecoded
            else {
              val frameSize = fmt.getFrameSize
              val step = math.max(1L, frames / (64L * framesPerSegmentCap))
              val sums = new Array[Long](64)
              val counts = new Array[Long](64)
              val buf = new Array[Byte](frameSize)
              var f = 0L
              var eof = false
              while (f < frames && !eof) {
                var got = 0
                while (got < frameSize && !eof) {
                  val r = ain.read(buf, got, frameSize - got)
                  if (r < 0) eof = true else got += r
                }
                if (!eof) {
                  val seg = ((f * 64L) / frames).toInt
                  var c = 0
                  while (c < frameSize) {
                    val sample = ((buf(c) & 0xFF) | (buf(c + 1) << 8)).toShort
                    sums(seg) += math.abs(sample.toLong)
                    counts(seg) += 1L
                    c += 2
                  }
                  if (step > 1L) {
                    var toSkip = (step - 1L) * frameSize
                    while (toSkip > 0L && !eof) {
                      val sk = ain.skip(toSkip)
                      if (sk > 0L) toSkip -= sk
                      else if (sk < 0L) eof = true
                      else {
                        // skip() == 0 is NOT EOF for decoded/wrapped
                        // streams (the JDK contract allows a legitimate
                        // zero-byte skip mid-stream) — treating it as EOF
                        // would silently truncate the envelope and change
                        // the hash (ADVICE r13). Drain via read instead;
                        // only read's -1 is authoritative end-of-stream.
                        val n = ain.read(buf, 0,
                          math.min(toSkip, frameSize.toLong).toInt)
                        if (n < 0) eof = true else toSkip -= n
                      }
                    }
                  }
                }
                f += step
              }
              val total = sums.sum
              val n = counts.sum
              if (n == 0L) undecoded
              else {
                var bits = 0L
                var s = 0
                while (s < 64) {
                  if (counts(s) > 0L && sums(s) * n >= total * counts(s))
                    bits |= (1L << s)
                  s += 1
                }
                AudioHash(m.media_id, bits, decoded = true)
              }
            }
          } finally ain.close()
        } catch { case _: Exception => undecoded }
      }
    }
  }

  /** REAL audio decode (JDK `javax.sound.sampled`): container/format
    * metadata (sample rate, channels, frame count) without materializing
    * samples — the header is enough for corpus curation features like
    * duration filtering. Same degrade-don't-throw contract as images.
    */
  def extractAudioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      iter.map { r =>
        val undecoded = AudioFeatures(r.media_id, r.payload.length, -1.0, -1, -1L, decoded = false)
        try {
          val in = audioInput(r.payload)
          try {
            val fmt = in.getFormat
            AudioFeatures(r.media_id, r.payload.length,
              fmt.getSampleRate.toDouble, fmt.getChannels, in.getFrameLength, decoded = true)
          } finally in.close()
        } catch { case _: Exception => undecoded }
      }
    }
  }

  /** STUB resize: stands in for a thumbnail/transcode stage. Output payload
    * is a deterministic function of the input (prefix + checksum tail), so
    * the pipeline shape payload→payload with bounded output size is real.
    */
  def resizeStub(media: Dataset[MediaRow], maxBytes: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      iter.map { r =>
        val out =
          if (r.payload.length <= maxBytes) r.payload
          else java.util.Arrays.copyOf(r.payload, maxBytes)
        r.copy(payload = out, mime = r.mime + ";resized")
      }
    }
  }

  final case class AudioResampled(
      media_id: Long, orig_rate: Int, orig_channels: Int, orig_frames: Long,
      rate: Int, frames: Long, payload: Array[Byte], decoded: Boolean)

  /** REAL audio resample + mono mixdown (JDK `javax.sound.sampled`, no
    * external libs) — the speech-corpus prep staple ("everything to
    * 16 kHz mono") as a scan-local map stage. PCM16 little-endian input
    * decodes, channels average into mono (truncating integer division —
    * deterministic, and exact whenever channels agree), and the rate
    * converts by NEAREST-NEIGHBOR frame mapping: output frame `j` reads
    * source frame `j·srcRate / targetRate` (floor, 64-bit), so
    * `frames_out = frames_in·target / src` and every output sample IS a
    * source sample — all pure integer math a SQL oracle can replay, and
    * segment-aligned for power-of-two factors (the q208 gate pins
    * [[audioEnergyHash]] INVARIANT under 2× up/down resampling of the
    * planted envelope fixture). Nearest-neighbor is the honest
    * no-libs-in-container choice (a production swap-in would be a
    * windowed-sinc kernel in the same row shape); non-PCM16 or corrupt
    * payloads degrade to `decoded = false`, never an exception. Per-row
    * memory is O(payload + output) — the same bound as holding the
    * binary column at all.
    */
  def resampleAudio(
      media: Dataset[MediaRow], targetRate: Int): Dataset[AudioResampled] = {
    require(targetRate >= 1 && targetRate <= 192000,
      s"targetRate must be in [1, 192000], got $targetRate")
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      iter.map { m =>
        val undecoded = AudioResampled(
          m.media_id, -1, -1, -1L, targetRate, -1L, Array.empty, decoded = false)
        try {
          val ain = audioInput(m.payload)
          try {
            val fmt = ain.getFormat
            val srcRate = math.round(fmt.getSampleRate)
            val ch = fmt.getChannels
            if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
              srcRate <= 0 || ch <= 0 || ain.getFrameLength <= 0L) undecoded
            else {
              val frameSize = fmt.getFrameSize
              val pcm = ain.readAllBytes()
              val nIn = math.min(ain.getFrameLength, (pcm.length / frameSize).toLong).toInt
              val mono = new Array[Short](nIn)
              var f = 0
              while (f < nIn) {
                var c = 0
                var sum = 0
                while (c < ch) {
                  val off = f * frameSize + c * 2
                  sum += ((pcm(off) & 0xFF) | (pcm(off + 1) << 8)).toShort
                  c += 1
                }
                mono(f) = (sum / ch).toShort
                f += 1
              }
              val nOut = (nIn.toLong * targetRate / srcRate).toInt
              val out = new Array[Byte](nOut * 2)
              var j = 0
              while (j < nOut) {
                val v = mono((j.toLong * srcRate / targetRate).toInt)
                out(j * 2) = (v & 0xFF).toByte
                out(j * 2 + 1) = ((v >> 8) & 0xFF).toByte
                j += 1
              }
              val ofmt = new javax.sound.sampled.AudioFormat(
                targetRate.toFloat, 16, 1, true, false)
              val bos = new java.io.ByteArrayOutputStream()
              writeWave(
                new javax.sound.sampled.AudioInputStream(
                  new java.io.ByteArrayInputStream(out), ofmt, nOut.toLong), bos)
              AudioResampled(m.media_id, srcRate, ch, nIn.toLong,
                targetRate, nOut.toLong, bos.toByteArray, decoded = true)
            }
          } finally ain.close()
        } catch { case _: Exception => undecoded }
      }
    }
  }

  final case class ImageResized(
      media_id: Long, orig_w: Int, orig_h: Int, width: Int, height: Int,
      payload: Array[Byte], decoded: Boolean)

  /** REAL thumbnail resize — the raster upgrade of [[resizeStub]] on the
    * JDK's own codecs (ImageIO decode → exact integer BOX FILTER → PNG
    * re-encode; no external libs, the q71/q180 rule). The longest side
    * shrinks to `maxDim`, never upscales; output dims are pure integer
    * math (`nw = max(1, w·maxDim / max(w,h))`, floor division) so a SQL
    * oracle replays them exactly. The box filter averages each output
    * pixel's source rect per channel with integer rounding
    * (`(sum + n/2) / n`) — deterministic across JVMs and platforms,
    * unlike Java2D interpolation hints, so solid regions round-trip
    * BIT-EXACT and a gate can pin the full decode→resize→encode→decode
    * cycle. Source rects partition the image (floor boundaries, every
    * source pixel lands in exactly one output rect when nw divides w;
    * adjacent rects never gap). Undecodable payloads degrade to
    * `decoded = false`, −1 dims, empty payload — never an exception.
    * Scan-local per row ([[extractImageFeatures]]' partitioning rule):
    * at 100 TB this is a map-only stage, no shuffle anywhere.
    */
  def resizeImage(media: Dataset[MediaRow], maxDim: Int): Dataset[ImageResized] = {
    require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      iter.map { m =>
        decodeImage(m.payload) match {
          case None =>
            ImageResized(m.media_id, -1, -1, -1, -1, Array.empty, decoded = false)
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            val mx = math.max(w, h)
            val (nw, nh) =
              if (mx <= maxDim) (w, h)
              else (math.max(1, (w.toLong * maxDim / mx).toInt),
                math.max(1, (h.toLong * maxDim / mx).toInt))
            // one BULK pixel read/write instead of per-pixel
            // getRGB/setRGB (each pays a ColorModel conversion — code
            // review r16); the identity case skips the filter entirely
            val src = img.getRGB(0, 0, w, h, null, 0, w)
            val dst =
              if (nw == w && nh == h) src
              else {
                val d = new Array[Int](nw * nh)
                var oy = 0
                while (oy < nh) {
                  val sy0 = oy * h / nh
                  val sy1 = math.max(sy0 + 1, (oy + 1) * h / nh)
                  var ox = 0
                  while (ox < nw) {
                    val sx0 = ox * w / nw
                    val sx1 = math.max(sx0 + 1, (ox + 1) * w / nw)
                    var sr = 0L; var sg = 0L; var sb = 0L; var n = 0L
                    var y = sy0
                    while (y < sy1) {
                      val row = y * w
                      var x = sx0
                      while (x < sx1) {
                        val rgb = src(row + x)
                        sr += (rgb >> 16) & 0xFF
                        sg += (rgb >> 8) & 0xFF
                        sb += rgb & 0xFF
                        n += 1L
                        x += 1
                      }
                      y += 1
                    }
                    val half = n / 2
                    d(oy * nw + ox) =
                      ((((sr + half) / n).toInt) << 16) |
                        ((((sg + half) / n).toInt) << 8) |
                        ((sb + half) / n).toInt
                    ox += 1
                  }
                  oy += 1
                }
                d
              }
            val out = new java.awt.image.BufferedImage(
              nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            out.setRGB(0, 0, nw, nh, dst, 0, nw)
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            ImageResized(m.media_id, w, h, nw, nh, bos.toByteArray, decoded = true)
        }
      }
    }
  }

  final case class VideoFrame(
      media_id: Long, frame_idx: Int, n_frames: Int, width: Int, height: Int,
      payload: Array[Byte], decoded: Boolean)

  /** REAL frame sampling over the one animation container the JDK CAN
    * demux: multi-frame GIF via ImageIO (every other video container
    * stays [[frameSampleStub]] — the JDK ships no MP4/MKV demuxer, the
    * honest environment limit). This is a real demuxer, not a byte
    * chopper: frames decode IN SEQUENCE onto a composition canvas sized
    * by the frame descriptors, each frame draws at its
    * `(imageLeftPosition, imageTopPosition)` offset (GIF frames are
    * often partial-rect deltas) onto a canvas sized by the LOGICAL
    * SCREEN descriptor (frame extents as the fallback), and the
    * per-frame DISPOSAL method applies between frames (`doNotDispose`
    * accumulates, `restoreToBackgroundColor` clears the frame's rect,
    * `restoreToPrevious` reverts the canvas) — so a sampled frame is
    * what a viewer would SHOW at that index, not whatever rectangle
    * happened to be stored. One DOCUMENTED deviation:
    * `restoreToBackgroundColor` clears to opaque black (the canvas
    * background), not the global-palette background color — modern
    * viewers themselves disagree here (most treat the disposed rect as
    * TRANSPARENT, which over this opaque-RGB canvas composites as
    * black), and the palette background is the least-honored field in
    * the GIF89a spec. Every `stride`-th composed frame re-encodes
    * as PNG and emits with its index and the total count; corrupt or
    * reader-less payloads degrade to one `decoded = false` row. Works on
    * any ImageIO multi-image input (a plain PNG emits its one frame).
    * Scan-local per row; per-row memory is O(canvas + one frame), frames
    * stream through the reader one at a time.
    */
  def sampleGifFrames(
      media: Dataset[MediaRow], stride: Int): Dataset[VideoFrame] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      iter.flatMap { m =>
        val undecoded =
          VideoFrame(m.media_id, -1, -1, -1, -1, Array.empty, decoded = false)
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(m.payload))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) { iis.close(); Seq(undecoded) }
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              val n = reader.getNumImages(true)
              def attr(node: org.w3c.dom.Node, name: String): Option[String] = {
                val a = node.getAttributes
                Option(a).flatMap(as => Option(as.getNamedItem(name))).map(_.getNodeValue)
              }
              def childNode(root: org.w3c.dom.Node, name: String): Option[org.w3c.dom.Node] = {
                var c = root.getFirstChild
                while (c != null && c.getNodeName != name) c = c.getNextSibling
                Option(c)
              }
              // first pass over DESCRIPTORS only (no pixel decode): the
              // composition canvas must cover every frame's rect
              val descs = (0 until n).map { i =>
                val md = reader.getImageMetadata(i)
                val root = md.getAsTree(md.getNativeMetadataFormatName)
                val d = childNode(root, "ImageDescriptor")
                val gce = childNode(root, "GraphicControlExtension")
                (d.flatMap(attr(_, "imageLeftPosition")).map(_.toInt).getOrElse(0),
                  d.flatMap(attr(_, "imageTopPosition")).map(_.toInt).getOrElse(0),
                  d.flatMap(attr(_, "imageWidth")).map(_.toInt).getOrElse(reader.getWidth(i)),
                  d.flatMap(attr(_, "imageHeight")).map(_.toInt).getOrElse(reader.getHeight(i)),
                  gce.flatMap(attr(_, "disposalMethod")).getOrElse("none"))
              }
              // the composition surface is the GIF's LOGICAL SCREEN — an
              // optimized GIF's frames are partial rects that may never
              // cover it, so sizing from frame extents alone would shift
              // dims and coordinates (code review r16). Max with the
              // frame extents as the fallback for non-GIF multi-image
              // inputs (and malformed descriptors).
              val (screenW, screenH) =
                try {
                  val smd = reader.getStreamMetadata
                  if (smd == null) (0, 0)
                  else {
                    val sroot = smd.getAsTree(smd.getNativeMetadataFormatName)
                    val lsd = childNode(sroot, "LogicalScreenDescriptor")
                    (lsd.flatMap(attr(_, "logicalScreenWidth")).map(_.toInt).getOrElse(0),
                      lsd.flatMap(attr(_, "logicalScreenHeight")).map(_.toInt).getOrElse(0))
                  }
                } catch { case _: Exception => (0, 0) }
              val cw = math.max(screenW, descs.map(d => d._1 + d._3).max)
              val chh = math.max(screenH, descs.map(d => d._2 + d._4).max)
              val canvas = new java.awt.image.BufferedImage(
                cw, chh, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = canvas.createGraphics()
              try {
                val out = scala.collection.mutable.ArrayBuffer.empty[VideoFrame]
                var i = 0
                while (i < n) {
                  val (left, top, fw, fh, disposal) = descs(i)
                  val prev =
                    if (disposal == "restoreToPrevious")
                      canvas.getRGB(0, 0, cw, chh, null, 0, cw)
                    else null
                  g.drawImage(reader.read(i), left, top, null)
                  if (i % stride == 0) {
                    val bos = new java.io.ByteArrayOutputStream()
                    javax.imageio.ImageIO.write(canvas, "png", bos)
                    out += VideoFrame(m.media_id, i, n, cw, chh,
                      bos.toByteArray, decoded = true)
                  }
                  disposal match {
                    case "restoreToBackgroundColor" =>
                      val old = g.getColor
                      g.setColor(java.awt.Color.BLACK)
                      g.fillRect(left, top, fw, fh)
                      g.setColor(old)
                    case "restoreToPrevious" =>
                      canvas.setRGB(0, 0, cw, chh, prev, 0, cw)
                    case _ => ()
                  }
                  i += 1
                }
                out.toSeq
              } finally g.dispose()
            } finally { reader.dispose(); iis.close() }
          }
        } catch { case _: Exception => Seq(undecoded) }
      }
    }
  }

  /** STUB frame sampler: a "video" payload fans out to one row per sampled
    * frame (1→N flatMap in typed land) — the shape that matters: output
    * cardinality is controlled by stride, partitions stay bounded, and the
    * frame index travels in the id so downstream joins stay keyable.
    */
  def frameSampleStub(media: Dataset[MediaRow], frameBytes: Int, stride: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      // ceil so the tail remainder is emitted as a partial frame (same
      // behavior for payloads shorter and longer than one frame)
      val nFrames = math.max(1, (r.payload.length + frameBytes - 1) / frameBytes)
      (0 until nFrames by stride).map { f =>
        val from = f * frameBytes
        val until = math.min(r.payload.length, from + frameBytes)
        MediaRow(r.media_id * 1000000L + f,
          java.util.Arrays.copyOfRange(r.payload, from, until),
          r.mime + s";frame=$f")
      }
    }
  }

  /** Lift a text table into the media shape (payload = utf-8 bytes) — the
    * test harness for the plumbing, since the container ships no media.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs
      .filter(col("text").isNotNull) // media contract: payload is non-null
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("mime")).as[MediaRow]
  }
}
