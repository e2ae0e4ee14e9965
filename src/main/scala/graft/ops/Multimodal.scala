package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns beside typed metadata; decode / feature-extraction runs
  * per-partition so one task amortizes decoder setup over a whole batch —
  * the Spark-side shape that matters at 100 TB (payloads never hit the
  * driver, partitions bound memory).
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment): [[decodeStub]] derives deterministic fake features from the
  * bytes. The schema, partitioning, and per-partition batch shape are real
  * and tested.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, payload: Array[Byte], mime: String)
  final case class MediaFeatures(
      media_id: Long, n_bytes: Int, width: Int, height: Int, checksum: Long)

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
