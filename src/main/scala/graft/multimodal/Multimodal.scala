package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * BINARY columns with typed metadata structs; decode / feature-extract /
  * frame-sample run as partition-local batch functions over the binary
  * column (the Scala analog of `mapInPandas` batches).
  *
  * The actual codecs are NOT available in this environment, so the decode
  * kernel is a clearly-marked deterministic stub ([[stubDecode]]) — the
  * Spark-side contract (schema, encoders, partition batching, column
  * pruning before the heavy kernel) is real and tested. Swap
  * [[stubDecode]] for a JNI/FFI codec in production.
  */
object Multimodal {

  /** Typed metadata extracted from a media payload. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, content_md5: String,
                             width: Int, height: Int)

  /** Raw payload row: id + opaque bytes. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** ======== STUB ========
    * Deterministic fake decoder: "dimensions" derived from the payload
    * md5 so results are stable and oracle-checkable. A real build would
    * call the image codec here; everything around it stays unchanged. */
  def stubDecode(payload: Array[Byte]): (Long, String, Int, Int) = {
    val h = md5Hex(payload)
    val w = 64 + (h.charAt(0).toInt % 16) * 16
    val ht = 64 + (h.charAt(1).toInt % 16) * 16
    (payload.length.toLong, h, w, ht)
  }

  /** Decode a binary payload column into typed metadata. Runs as a
    * partition-local map over the pruned (id, payload) projection — the
    * scan reads only those two columns (check ReadSchema in explain). */
  def decodeMeta(media: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload"): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).as("doc_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        // per-partition init (real codecs are expensive to construct)
        it.map { r =>
          val (n, h, w, ht) = stubDecode(r.payload)
          MediaMeta(r.doc_id, n, h, w, ht)
        }
      }
  }

  /** Deterministic frame sampling: pick every `stride`-th chunk of
    * `chunk` bytes as a "frame" — the shape of video frame extraction
    * (explode to one row per frame) without the codec. */
  def sampleFrames(media: DataFrame, chunk: Int = 1024, stride: Int = 4,
                   idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).as("doc_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .flatMap { r =>
        r.payload.grouped(chunk).zipWithIndex
          .filter { case (_, i) => i % stride == 0 }
          .map { case (bytes, i) => (r.doc_id, i, bytes.length, md5Hex(bytes)) }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes", "frame_md5")
  }

  /** Documents→media adapter for the test tables: treats the utf-8 text
    * bytes as the opaque payload. */
  def documentsAsMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
}
