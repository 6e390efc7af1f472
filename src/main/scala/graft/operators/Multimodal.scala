package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The container has no media codecs, so the DECODE STEP IS A STUB — a
  * clearly-marked deterministic fake (dims derived from the payload's
  * md5). Everything around it is real and tested: the binary schema, the
  * mapPartitions batch shape (decoder initialized once per partition,
  * exactly how a JNI/codec handle would be), partitioning, and the
  * downstream metadata/frame queries.
  */
object Multimodal {

  /** One media object: opaque bytes + typed metadata. */
  case class MediaRecord(media_id: Long, media_type: String, payload: Array[Byte])
  case class DecodedMeta(media_id: Long, media_type: String, n_bytes: Long,
                         checksum: String, width: Int, height: Int)
  case class Frame(media_id: Long, frame_no: Long, byte_offset: Long)

  /** Ingest the documents fixture as opaque binary payloads (stand-in
    * for real image/audio bytes; schema and plumbing are the point). */
  def asBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image/fake").as("media_type"),
      col("text").cast("binary").as("payload"))

  /** Column-expression metadata decode (oracle-checkable): byte length,
    * md5 checksum, and STUB dimensions derived deterministically from
    * the checksum — a real deployment swaps the width/height exprs for
    * the codec-backed mapPartitions path below. */
  def decodeMetaExpr(media: DataFrame): DataFrame = {
    val checksum = md5(col("payload"))
    media.select(
      col("media_id"), col("media_type"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      checksum.as("checksum"),
      (conv(substring(checksum, 1, 4), 16, 10).cast("int") % 1856 + 64).as("width"),
      (conv(substring(checksum, 5, 4), 16, 10).cast("int") % 1016 + 64).as("height"))
  }

  /** The production decode shape: mapPartitions so the decoder is
    * initialized once per partition (the way a codec/JNI handle must
    * be), processing records as a streaming iterator — no partition
    * materialization. The decoder itself is the STUB. */
  def decodeMetaPartitions(spark: SparkSession, media: DataFrame): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.select("media_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions { it =>
        // STUB: real code constructs the native decoder here, once.
        val decoder = FakeDecoder
        it.map { r =>
          val (w, h, sum) = decoder.decode(r.payload)
          DecodedMeta(r.media_id, r.media_type, r.payload.length.toLong, sum, w, h)
        }
      }
  }

  /** Frame sampling: one row per `stride`-byte frame of the payload —
    * the video-frame / audio-window extraction shape (explode of a
    * lazily-generated sequence; no shuffle). */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media
      .select(col("media_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"))
      .select(col("media_id"),
        explode(sequence(lit(0L), expr(s"n_bytes div $stride"))).as("frame_no"))
      .select(col("media_id"), col("frame_no"),
        (col("frame_no") * stride).as("byte_offset"))

  case class Features(media_id: Long, features: Array[Float])
  case class Resized(media_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** Feature extraction: a 16-bin normalized byte histogram per payload
    * — a REAL computation (no codec needed), in the exact shape a CNN
    * embedding extractor would use: mapPartitions with one model/codec
    * handle per partition, Array[Float] feature column out, ready for
    * the [[Similarity]] ANN operators. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[Features] = {
    import spark.implicits._
    media.select("media_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions { it =>
        // real code: initialize the feature model here, once per partition
        it.map { r =>
          val hist = new Array[Float](16)
          r.payload.foreach { b => hist((b & 0xff) >> 4) += 1f }
          val n = math.max(r.payload.length, 1).toFloat
          Features(r.media_id, hist.map(_ / n))
        }
      }
  }

  /** Resize: STUB — a real deployment decodes, scales, re-encodes via a
    * codec inside this mapPartitions; the stub halves the fake dims and
    * truncates the payload proportionally, keeping the schema and batch
    * shape (the Spark-side contract) real. */
  def resize(spark: SparkSession, media: DataFrame, maxDim: Int): Dataset[Resized] = {
    import spark.implicits._
    media.select("media_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions { it =>
        val decoder = FakeDecoder
        it.map { r =>
          val (w, h, _) = decoder.decode(r.payload)
          val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
          val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          // STUB re-encode: proportional byte truncation
          val nBytes = math.max(1, (r.payload.length * scale * scale).toInt)
          Resized(r.media_id, nw, nh, r.payload.take(nBytes))
        }
      }
  }

  /** STUB decoder — deterministic fake standing in for an image codec.
    * Must produce the same dims as [[decodeMetaExpr]]. */
  private object FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Int, String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(payload).map("%02x".format(_)).mkString
      val w = (java.lang.Long.parseLong(hex.substring(0, 4), 16) % 1856 + 64).toInt
      val h = (java.lang.Long.parseLong(hex.substring(4, 8), 16) % 1016 + 64).toInt
      (w, h, hex)
    }
  }
}
