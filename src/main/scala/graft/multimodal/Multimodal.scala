package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * BINARY columns with typed metadata structs; decode / feature-extract /
  * frame-sample run as partition-local batch functions over the binary
  * column (the Scala analog of `mapInPandas` batches).
  *
  * The decode kernel is a real (if minimal) image codec: a from-scratch
  * binary PPM (P6, netpbm) header parser — ASCII dimensions with comment
  * and whitespace handling per the spec. Heavier codecs (JPEG/PNG via
  * JNI/FFI) slot into the same partition-local kernel; the Spark-side
  * contract (schema, encoders, partition batching, column pruning before
  * the heavy kernel) is unchanged by the codec choice.
  */
object Multimodal {

  /** Typed metadata extracted from a media payload. Unparseable payloads
    * carry width/height/maxval = -1 (kept, not dropped — a 100 TB scrub
    * wants to COUNT corrupt rows, not silently lose them). */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, content_md5: String,
                             width: Int, height: Int, maxval: Int)

  /** Raw payload row: id + opaque bytes. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** Real minimal image decoder: binary PPM (P6) header — magic "P6",
    * then width, height, maxval as ASCII decimals separated by
    * whitespace, with '#'-to-end-of-line comments allowed before each
    * token (the netpbm grammar). Returns None when the payload is not a
    * parseable P6 header. Pixel samples follow the header and are left
    * untouched here (frame/pixel access is [[sampleFrames]]' job). */
  def decodePpm(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    if (payload.length < 2 || payload(0) != 'P'.toByte || payload(1) != '6'.toByte) None
    else {
      var i = 2
      def skipWsAndComments(): Unit = {
        var more = true
        while (more) {
          while (i < payload.length &&
            (payload(i) == ' ' || payload(i) == '\n' || payload(i) == '\r' || payload(i) == '\t')) i += 1
          if (i < payload.length && payload(i) == '#'.toByte) {
            while (i < payload.length && payload(i) != '\n'.toByte) i += 1
          } else more = false
        }
      }
      def readInt(): Option[Int] = {
        skipWsAndComments()
        val s = i
        while (i < payload.length && payload(i) >= '0'.toByte && payload(i) <= '9'.toByte) i += 1
        // ≤9 digits keeps the value inside Int range; a longer run is a
        // corrupt header and must yield None (kept+flagged), not a throw.
        if (i == s || i - s > 9) None
        else Some(new String(payload, s, i - s, "US-ASCII").toInt)
      }
      for { w <- readInt(); h <- readInt(); mv <- readInt() } yield (w, h, mv)
    }
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
          val (w, h, mv) = decodePpm(r.payload).getOrElse((-1, -1, -1))
          MediaMeta(r.doc_id, r.payload.length.toLong, md5Hex(r.payload), w, h, mv)
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

  /** Documents→PPM adapter: wraps each document's text bytes in a real
    * binary-PPM (P6) header with deterministic dimensions (derived from
    * doc_id / text length so the oracle can replay the construction —
    * the round-trip proves the parser actually reads the header, since
    * the oracle's expected dims come from the construction formula, not
    * from parsing). Pure Column ops; the payload bytes are identical to
    * DuckDB's encode() of the same string. */
  def documentsAsPpm(docs: DataFrame): DataFrame = {
    val w = (lit(1) + col("doc_id") % 64).cast("string")
    val h = (lit(1) + length(col("text")) % 64).cast("string")
    docs.select(col("doc_id"),
      encode(concat(lit("P6\n"), w, lit(" "), h, lit("\n255\n"), col("text")),
        "UTF-8").as("payload"))
  }
}
