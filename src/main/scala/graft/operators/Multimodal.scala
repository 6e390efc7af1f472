package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * resize / frame-sample operators.
  *
  * The image path is REAL: payloads are PNG bytes, and decode/resize
  * run through `javax.imageio` (pure-JVM PNG codec — no container
  * dependencies) inside the production mapPartitions shape (codec
  * handle per partition, streaming iterator, no partition
  * materialization). Because the synthetic fixture's pixel content is
  * a closed-form function of (media_id, x, y), every decoded quantity
  * — dimensions, pixel count, channel sum — is independently
  * computable by a SQL oracle, so the encode→decode→resample
  * round-trip is hash-checked end to end, not trusted.
  */
object Multimodal {

  /** One media object: opaque bytes + typed metadata. */
  case class MediaRecord(media_id: Long, media_type: String, payload: Array[Byte])

  /** Ingest the documents fixture as opaque binary payloads (stand-in
    * for real image/audio bytes; schema and plumbing are the point). */
  def asBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image/fake").as("media_type"),
      col("text").cast("binary").as("payload"))

  /** Column-expression payload metadata (oracle-checkable without any
    * codec): byte length + md5 checksum — the content-addressing pair
    * the exact-dup shrink and the lake manifest key on. Dimensions
    * come from the REAL decode paths below, never from the payload
    * hash. */
  def decodeMetaExpr(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("media_type"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("checksum"))

  // ---------------------------------------------------------------
  // Real PNG path (javax.imageio — pure JVM, no container codecs)
  // ---------------------------------------------------------------

  /** Deterministic gray value of pixel (x, y) of media `id` — the
    * closed-form pixel function shared by [[synthesizePng]] (which
    * paints it), the decode/resize operators' oracles (which recompute
    * its sums in SQL), and the specs. */
  @inline private[operators] def pixelValue(id: Long, x: Int, y: Int): Int =
    ((id + 7L * x + 13L * y) % 256L).toInt

  /** Synthesize one REAL PNG per document: dims are arithmetic on the
    * id (w = id%16+4 ∈ [4,19], h = (id/16)%8+4 ∈ [4,11]) and every
    * pixel is [[pixelValue]] painted gray — then encoded through
    * `javax.imageio`'s PNG writer. mapPartitions so the writer runs
    * inside the task with no per-row plugin scan; output payloads are
    * genuine decodable PNGs (IHDR + IDAT + zlib), the fixture for the
    * real-decode operators below. */
  def synthesizePng(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (id % 16 + 4).toInt
          val h = ((id / 16) % 8 + 4).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = pixelValue(id, x, y)
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRecord(id, "image/png", bos.toByteArray)
        }
      }
  }

  /** Decoded-image stats: REAL dims from the codec plus the gray-
    * channel pixel sum — every column recomputable by the oracle from
    * media_id alone, so a codec/color-model/byte-order defect anywhere
    * in the encode→decode round-trip is a hash mismatch. */
  case class PngMeta(media_id: Long, media_type: String, width: Int,
                     height: Int, n_pixels: Long, px_sum: Long)

  /** REAL image decode via `javax.imageio` in the production shape:
    * mapPartitions (codec resolved once per partition — the way a
    * JNI/native handle must be), streaming iterator, no partition
    * materialization. Throws on an undecodable payload — silent nulls
    * would let a corrupt shard pass the gate. */
  def decodePng(spark: SparkSession, media: DataFrame): Dataset[PngMeta] = {
    import spark.implicits._
    media.select("media_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions { it =>
        // Resolve the PNG reader ONCE per partition (ImageIO.read's
        // per-call plugin scan is the classic per-row codec cost).
        val reader = pngReader()
        it.map { r =>
          val img = readPng(reader, r.payload, r.media_id)
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              sum += (img.getRGB(x, y) & 0xff); x += 1
            }
            y += 1
          }
          PngMeta(r.media_id, r.media_type, img.getWidth, img.getHeight,
            img.getWidth.toLong * img.getHeight, sum)
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

  /** Resize round-trip stats: original and resized REAL dims (the
    * resized ones read back from the RE-ENCODED PNG, proving the
    * output payload is a genuine decodable image) plus the resized
    * pixel sum — all oracle-recomputable from media_id. */
  case class ResizedMeta(media_id: Long, width: Int, height: Int,
                         new_width: Int, new_height: Int, px_sum: Long)

  /** REAL image resize: decode via `javax.imageio`, nearest-neighbor
    * resample so the longest side is ≤ `maxDim` (integer index map
    * sx = x·w/nw — exact arithmetic both engines reproduce, unlike
    * AWT's implementation-defined interpolators), re-encode as PNG,
    * then DECODE THE RE-ENCODED BYTES and report dims/pixels from that
    * second decode — the emitted stats certify the output payload, not
    * the in-memory raster. Aspect ratio is preserved by integer floor
    * (nw = w·maxDim/max(w,h), min 1). */
  def resizePng(spark: SparkSession, media: DataFrame, maxDim: Int): Dataset[ResizedMeta] = {
    require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
    import spark.implicits._
    media.select("media_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions { it =>
        val reader = pngReader()
        it.map { r =>
          val img = readPng(reader, r.payload, r.media_id)
          val (w, h) = (img.getWidth, img.getHeight)
          val mx = math.max(w, h)
          val (nw, nh) =
            if (mx <= maxDim) (w, h)
            else (math.max(1, w * maxDim / mx), math.max(1, h * maxDim / mx))
          val out = new java.awt.image.BufferedImage(
            nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < nh) {
            var x = 0
            while (x < nw) {
              out.setRGB(x, y, img.getRGB(x * w / nw, y * h / nh)); x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          val reread = readPng(reader, bos.toByteArray, r.media_id)
          var sum = 0L
          y = 0
          while (y < reread.getHeight) {
            var x = 0
            while (x < reread.getWidth) {
              sum += (reread.getRGB(x, y) & 0xff); x += 1
            }
            y += 1
          }
          ResizedMeta(r.media_id, w, h, reread.getWidth, reread.getHeight, sum)
        }
      }
  }

  /** Per-media perceptual hash row: the 64-bit average-hash as a
    * '0'/'1' bitstring (row-major, no sign ambiguity across engines)
    * plus the 8×8 grayscale mean it thresholds on. */
  case class PerceptualHash(media_id: Long, ahash: String, mean_px: Double)

  /** Perceptual average-hash (aHash) from the REAL decoded raster: the
    * classic image near-dup fingerprint — downsample to 8×8 by the same
    * exact integer index map the resize path uses (sx = x·w/8), take
    * the grayscale mean, emit bit = (pixel > mean) in row-major order.
    * Visually identical images (re-encodes, exact scalings) collide on
    * the hash; the hash is then the BLOCKING KEY for media dedup —
    * group-by-ahash, never pairwise pixel comparison, so at 100 TB the
    * cost is one decode pass + one 64-char-key shuffle of (id, hash)
    * rows (the dd01 exact-dedup shape with a perceptual key).
    *
    * The mean is sum/64.0 — an exact double (÷2⁶), so the strict `>`
    * threshold is engine-independent; the sampled pixels of the
    * synthetic fixture are closed-form in media_id, which lets a SQL
    * oracle recompute the entire hash without any codec. */
  def aHashPng(spark: SparkSession, media: DataFrame): Dataset[PerceptualHash] = {
    import spark.implicits._
    media.select("media_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions { it =>
        val reader = pngReader()
        it.map { r =>
          val img = readPng(reader, r.payload, r.media_id)
          val (w, h) = (img.getWidth, img.getHeight)
          val px = new Array[Int](64)
          var sum = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val v = img.getRGB(x * w / 8, y * h / 8) & 0xff
              px(y * 8 + x) = v; sum += v; x += 1
            }
            y += 1
          }
          val mu = sum / 64.0
          val bits = new java.lang.StringBuilder(64)
          var i = 0
          while (i < 64) {
            bits.append(if (px(i) > mu) '1' else '0'); i += 1
          }
          PerceptualHash(r.media_id, bits.toString, mu)
        }
      }
  }

  /** One PNG `ImageReader` per partition (stateful: callers must use it
    * single-threaded within the task, which mapPartitions guarantees). */
  private def pngReader(): javax.imageio.ImageReader = {
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("png")
    require(readers.hasNext, "JVM has no PNG ImageReader plugin")
    readers.next()
  }

  private def readPng(reader: javax.imageio.ImageReader, payload: Array[Byte],
                      mediaId: Long): java.awt.image.BufferedImage = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis)
      val img = reader.read(0)
      require(img != null, s"undecodable PNG payload for media $mediaId")
      img
    } finally iis.close()
  }
}
