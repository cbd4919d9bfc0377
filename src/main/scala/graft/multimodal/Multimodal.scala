package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: media as opaque
  * `binary` payloads + typed metadata, with decode / feature-extraction /
  * frame-sampling as per-partition batch transforms.
  *
  * Spark-side design (the part that must be real at 100 TB):
  *  - media rows carry `bytes: Array[Byte]` (parquet BINARY) — scans
  *    prune the column unless a stage actually touches pixels;
  *  - decode runs via typed-`Dataset` `mapPartitions` — the per-partition
  *    batch shape (iterator-in/iterator-out) is exactly what lets a real
  *    decoder amortize model/codec init once per partition, the same
  *    contract `mapInPandas` gives Python;
  *  - partitioning: repartition on media_id upstream bounds any
  *    decoder's working set per task.
  *
  * The decode kernel itself is a STUB — image/audio codecs are not in
  * this container — implemented as a deterministic fake so the plumbing
  * (schema, batching, explode of variable-length frame output) is fully
  * testable. Swap [[MediaDecoder.decode]] for a real codec to go live.
  */
final case class MediaRow(
    media_id: Long,
    kind: String,          // image | audio | video
    mime: String,
    bytes: Array[Byte])

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    width: Int,            // fake-decoded dims (stub)
    height: Int,
    n_frames: Int,
    content_hash: Long)

final case class FrameSample(
    media_id: Long,
    frame_idx: Int,
    frame_hash: Long)

/** STUB decoder: deterministic fake "decode" derived from the payload
  * bytes. Replace with a real codec (JNI/javacv/...) for production. */
object MediaDecoder {
  /** ??? real decode goes here; the deterministic fake below (dims/frames
    * as arithmetic on the content hash) keeps the pipeline testable
    * without codecs in the container. */
  def decode(h: Long): (Int, Int, Int) = {
    val width = 64 + (h % 1024).toInt
    val height = 64 + ((h >> 10) % 1024).toInt
    val nFrames = 1 + ((h >> 20) % 16).toInt
    (width, height, nFrames)
  }

  /** Content fingerprint: first 60 bits of MD5 as a non-negative long.
    * MD5 (not a bespoke rolling hash) so the fingerprint is reproducible
    * by any other engine from the same bytes — the property that lets an
    * external system (or the correctness oracle) audit content identity
    * without running this library. */
  def contentHash(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(bytes)
    // first 15 hex chars = 60 bits → always fits a positive Long
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    h >>> 4
  }
}

object Multimodal {

  /** Feature extraction: one decoder pass per partition batch. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens HERE (codec/model load in real life)
      rows.map { r =>
        val ch = MediaDecoder.contentHash(r.bytes)
        val (w, h, frames) = MediaDecoder.decode(ch)
        MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, w, h,
          frames, ch)
      }
    }
  }

  /** Frame sampling: variable-length output per row (iterator-out shape),
    * stride-2 sampling of the fake-decoded frames. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val ch = MediaDecoder.contentHash(r.bytes)
      val (_, _, frames) = MediaDecoder.decode(ch)
      (0 until frames by stride).map { i =>
        FrameSample(r.media_id, i, ch ^ i.toLong)
      }
    }
  }

  /** Synthesize a media table from `documents` (deterministic payloads:
    * UTF-8 bytes of the text; kind/mime assigned round-robin) — stands in
    * for a real binary-column source so the pipeline is exercised on the
    * driver test data. */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mime"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[MediaRow]
  }
}
