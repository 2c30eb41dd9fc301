package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension): image/audio/video
  * treated as opaque `binary` columns + typed metadata, with
  * decode/feature/resize/frame-sample stages.
  *
  * The Spark-side plumbing — schema, batch shape, partition-local
  * processing via typed mapPartitions, frame explosion — is real and
  * tested. The actual codec work is a clearly marked STUB (image/audio
  * libraries are not in this container): `decodeStub` derives
  * deterministic fake dimensions from the payload bytes, exactly where a
  * real `javax.imageio`/ffmpeg call would plug in.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, media_type: String, bytes: Array[Byte])
  case class DecodedMedia(media_id: Long, media_type: String,
                          width: Int, height: Int, channels: Int,
                          n_bytes: Int, content_sha: String)

  /** Build a media table from any (id, text) source: payload = UTF-8
    * bytes, type cycled deterministically. Stand-in for reading real blob
    * columns / object-store pointers. */
  def mediaFromDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3).cast("int") + 1).as("media_type"),
      col(textCol).cast("binary").as("bytes"))

  /** Pure-column metadata extraction (no decode): size, magic bytes,
    * content hash. Runs fully inside whole-stage codegen. */
  def extractMeta(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("media_type"),
      length(col("bytes")).as("n_bytes"),
      upper(hex(substring(col("bytes"), 1, 4))).as("magic_hex"),
      sha2(col("bytes"), 256).as("content_sha"))

  /** Decode stage: partition-local typed map — the shape a real decoder
    * runs in (one codec context per partition, streamed batches, no
    * driver involvement).
    *
    * STUB: width/height/channels are derived deterministically from the
    * payload (first bytes), standing in for a real header parse.
    */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select("media_id", "media_type", "bytes").as[MediaRecord]
      .mapPartitions { it =>
        // real impl: open codec once per partition here — the digest
        // follows the same one-context-per-partition discipline
        // (MessageDigest.digest() resets the instance after each call)
        val sha = java.security.MessageDigest.getInstance("SHA-256")
        val hexChars = "0123456789abcdef".toCharArray
        it.map { m =>
          val n = m.bytes.length
          val b0 = if (n > 0) m.bytes(0) & 0xFF else 0
          val b1 = if (n > 1) m.bytes(1) & 0xFF else 0
          val dig = sha.digest(m.bytes)
          val hex = new Array[Char](dig.length * 2)
          var i = 0
          while (i < dig.length) {
            hex(2 * i) = hexChars((dig(i) >> 4) & 0xF)
            hex(2 * i + 1) = hexChars(dig(i) & 0xF)
            i += 1
          }
          DecodedMedia(m.media_id, m.media_type,
            width = 16 + (b0 * 7) % 1904,   // ??? real: parse header
            height = 16 + (b1 * 13) % 1064, // ??? real: parse header
            channels = if (m.media_type == "audio") 2 else 3,
            n_bytes = n,
            content_sha = new String(hex))
        }
      }
  }

  /** Feature extraction: 16-bin histogram of payload byte high-nibbles —
    * a REAL (non-stub) content feature computed per row by
    * [[graft.functions.ByteHistogram]]; where a production pipeline
    * plugs in a learned encoder, the Spark shape (binary → fixed-width
    * vector column) is identical. */
  def byteFeatures(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("media_type"),
      length(col("bytes")).as("n_bytes"),
      graft.functions.ByteHistogram.of(col("bytes")).as("features"))

  /** Resize stage STUB: keep every `factor`-th byte of the payload —
    * deterministic byte decimation standing in for a real image/audio
    * resample (codec libraries are not in this container). Runs in the
    * same partition-local typed map as [[decodeStub]]. */
  def resizeStub(spark: SparkSession, media: DataFrame, factor: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    require(factor > 0, "factor must be positive")
    media.select("media_id", "media_type", "bytes").as[MediaRecord]
      .mapPartitions { it =>
        it.map { m =>
          val out = new Array[Byte]((m.bytes.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = m.bytes(i * factor); i += 1 }
          MediaRecord(m.media_id, m.media_type, out)
        }
      }
  }

  /** Frame sampling: split the payload into `n` equal byte slices
    * ("frames"), one output row per frame — the explode shape a video
    * pipeline uses. Pure column expressions. */
  def frameSample(media: DataFrame, n: Int): DataFrame = {
    val frameLen = greatest((length(col("bytes")) / n).cast("int"), lit(1))
    media.select(col("media_id"), col("media_type"), col("bytes"),
      frameLen.as("flen"),
      explode(sequence(lit(0), lit(n - 1))).as("frame_id"))
      .select(col("media_id"), col("media_type"), col("frame_id"),
        col("bytes").substr(col("frame_id") * col("flen") + 1, col("flen")).as("frame_bytes"))
  }
}
