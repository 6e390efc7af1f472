package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * resize / frame-sample / fingerprint operators.
  *
  * All three modality legs run REAL pure-JVM codecs inside the
  * production mapPartitions shape (codec handle per partition,
  * streaming iterator, no partition materialization):
  *  - image: PNG via `javax.imageio` (decode, resize, aHash);
  *  - video-shaped: multi-frame GIF89a via `javax.imageio`'s sequence
  *    reader/writer (per-frame extraction);
  *  - audio: RIFF/WAVE PCM via `javax.sound.sampled` (decode, windowed
  *    energy, perceptual fingerprint).
  * Because every synthetic payload's content is a closed-form function
  * of (media_id, position), every decoded quantity — dims, frame
  * counts, pixel/sample sums — is independently computable by a SQL
  * oracle, so each encode→decode round-trip is hash-checked end to
  * end, not trusted.
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
    graft.operators.NearDup.fanOut(docs.select(col("doc_id").cast("long"))).as[Long]
      .mapPartitions { it =>
        val writer = imageWriter("png")
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
          MediaRecord(id, "image/png", writeImage(writer, img))
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
        val writer = imageWriter("png")
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
          val reread = readPng(reader, writeImage(writer, out), r.media_id)
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
        val writer = imageWriter("png")
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

  // ---------------------------------------------------------------
  // Real JPEG path (javax.imageio — the LOSSY codec of the big-three
  // image formats; PNG and GIF above are lossless)
  // ---------------------------------------------------------------

  /** Whether block (bx, by) of media `id`'s JPEG raster is the HIGH
    * gray (192) or the LOW gray (64) — the closed-form pattern shared
    * by [[synthesizeJpeg]], the aHash oracle, and the specs.
    *
    * The pattern is engineered so aHash is EXACT despite JPEG loss:
    * for any id, each half of the 8×8 block grid has (3·bx + 5·by)
    * uniform mod 4 (bx residues repeat twice per half-row set, by
    * residues 0..3 once per half), so exactly 32 of 64 blocks are HIGH
    * — the pre-codec 8×8 downsample mean is pinned at
    * (32·64 + 32·192)/64 = 128 with a ±64 margin to either level,
    * while the id-dependent offsets (id, id div 4) still vary the
    * LAYOUT, giving real duplicate groups across ids. */
  @inline private[operators] def jpegBlockHigh(id: Long, bx: Int, by: Int): Boolean =
    (((if (by < 4) id else id / 4) + 3L * bx + 5L * by) % 4L) < 2L

  /** Synthesize one REAL JPEG per document: a 64×64 grayscale image of
    * flat 8×8 blocks ALIGNED TO JPEG'S DCT GRID (a flat block has only
    * a DC coefficient, so quantization error stays within a few gray
    * levels — far inside the 64-level margin the aHash thresholds
    * across), encoded through `javax.imageio`'s JPEG writer.
    * TYPE_BYTE_GRAY + raster samples: the JPEG codec reads/writes the
    * raster's luma samples verbatim; going through getRGB/setRGB would
    * insert the linear-gray→sRGB conversion and skew every value (the
    * GIF palette lesson, lossy edition). */
  def synthesizeJpeg(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.operators.NearDup.fanOut(docs.select(col("doc_id").cast("long"))).as[Long]
      .mapPartitions { it =>
        val writer = imageWriter("jpg")
        it.map { id =>
          val img = new java.awt.image.BufferedImage(
            64, 64, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < 64) {
            var x = 0
            while (x < 64) {
              val v = if (jpegBlockHigh(id, x / 8, y / 8)) 192 else 64
              raster.setSample(x, y, 0, v)
              x += 1
            }
            y += 1
          }
          MediaRecord(id, "image/jpeg", writeImage(writer, img))
        }
      }
  }

  /** Perceptual average-hash over the REAL JPEG decode — the lossy-
    * codec leg of [[aHashPng]]: decode via `javax.imageio`'s JPEG
    * reader (one reader per partition), 8×8 downsample by the exact
    * integer index map (x·w/8), mean threshold, 64-bit row-major
    * bitstring. Samples are read from the RASTER (raw decoded luma),
    * not getRGB — the gray color model's sRGB conversion would shift
    * values nonlinearly. aHash is deterministic despite lossy decode
    * because the fixture guarantees a ≥64-gray-level margin between
    * every sampled pixel and the mean, two orders beyond flat-block
    * quantization error; the hash itself (not the noisy pixels) is the
    * emitted, oracle-checked value. No mean_px column: unlike PNG, the
    * decoded mean carries codec-dependent noise and would not be
    * engine-reproducible. */
  def aHashJpeg(spark: SparkSession, media: DataFrame): Dataset[JpegHash] = {
    import spark.implicits._
    media.select("media_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions { it =>
        val reader = {
          val rs = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg")
          require(rs.hasNext, "JVM has no JPEG ImageReader plugin")
          rs.next()
        }
        it.map { r =>
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val img =
            try {
              reader.setInput(iis)
              val i = reader.read(0)
              require(i != null, s"undecodable JPEG payload for media ${r.media_id}")
              i
            } finally iis.close()
          val raster = img.getRaster
          val (w, h) = (img.getWidth, img.getHeight)
          val px = new Array[Int](64)
          var sum = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val v = raster.getSample(x * w / 8, y * h / 8, 0)
              px(y * 8 + x) = v; sum += v; x += 1
            }
            y += 1
          }
          val mu = sum / 64.0
          val bits = new java.lang.StringBuilder(64)
          var i = 0
          while (i < 64) { bits.append(if (px(i) > mu) '1' else '0'); i += 1 }
          JpegHash(r.media_id, bits.toString)
        }
      }
  }

  /** Per-media JPEG perceptual hash (no mean column — see
    * [[aHashJpeg]]). */
  case class JpegHash(media_id: Long, ahash: String)

  // ---------------------------------------------------------------
  // Real multi-frame GIF path (javax.imageio — the pure-JVM container
  // with FRAMES, standing in for video: per-frame decode is the
  // frame-sampling shape a video pipeline needs, on a real codec)
  // ---------------------------------------------------------------

  /** Closed-form gray value of pixel (x, y) in frame f of media `id` —
    * shared by [[synthesizeGif]], the frame-decode oracle, and specs. */
  @inline private[operators] def framePixelValue(id: Long, f: Int, x: Int, y: Int): Int =
    ((id + 5L * f + 7L * x + 13L * y) % 256L).toInt

  /** Per-id GIF geometry: w ∈ [4,15], h ∈ [4,9], frames ∈ [2,5]. */
  @inline private[operators] def gifDims(id: Long): (Int, Int) =
    ((id % 12 + 4).toInt, ((id / 12) % 6 + 4).toInt)
  @inline private[operators] def gifFrameCount(id: Long): Int = (id % 4 + 2).toInt

  /** Synthesize one REAL animated GIF per document: every frame is the
    * [[framePixelValue]] grayscale raster, written as a full frame (no
    * inter-frame delta) through `javax.imageio`'s GIF sequence writer.
    * Output payloads are genuine multi-frame GIF89a containers — the
    * fixture for the frame-decode operator below. */
  def synthesizeGif(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.operators.NearDup.fanOut(docs.select(col("doc_id").cast("long"))).as[Long]
      .mapPartitions { it =>
        val writer = {
          val ws = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
          require(ws.hasNext, "JVM has no GIF ImageWriter plugin")
          ws.next()
        }
        // one palette for the whole partition: the raster sample IS the
        // gray value under this explicit 256-gray sRGB IndexColorModel
        val grays = Array.tabulate(256)(_.toByte)
        val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
        it.map { id =>
          val (w, h) = gifDims(id)
          val nf = gifFrameCount(id)
          val bos = new java.io.ByteArrayOutputStream()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          // MODE_DISABLED: the JDK GIF writer interlaces by default, and
          // the decode side then returns rows out of order (and drops
          // the final pass on small rasters) — plain raster order is
          // the only layout that round-trips exactly.
          val param = writer.getDefaultWriteParam
          param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
          var f = 0
          while (f < nf) {
            // TYPE_BYTE_INDEXED with the explicit gray palette: GIF
            // stores indices + palette verbatim. (TYPE_BYTE_GRAY would
            // round-trip through a linear-gray→sRGB conversion and skew
            // every pixel.)
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                raster.setSample(x, y, 0, framePixelValue(id, f, x, y)); x += 1
              }
              y += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), param)
            f += 1
          }
          writer.endWriteSequence()
          ios.close()
          writer.reset()
          MediaRecord(id, "image/gif", bos.toByteArray)
        }
      }
  }

  /** One row per decoded GIF FRAME: real dims + gray pixel sum, every
    * column oracle-recomputable from (media_id, frame_no) alone. This
    * is the video frame-extraction shape — explode a container into
    * per-frame rows inside the decode task, never materializing the
    * whole clip as one value downstream. */
  case class GifFrame(media_id: Long, frame_no: Int, width: Int,
                      height: Int, px_sum: Long)

  def decodeGifFrames(spark: SparkSession, media: DataFrame): Dataset[GifFrame] = {
    import spark.implicits._
    media.select("media_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions { it =>
        val reader = {
          val rs = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
          require(rs.hasNext, "JVM has no GIF ImageReader plugin")
          rs.next()
        }
        it.flatMap { r =>
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          reader.setInput(iis)
          val nf = reader.getNumImages(true)
          require(nf > 0, s"undecodable GIF payload for media ${r.media_id}")
          val frames = (0 until nf).map { f =>
            val img = reader.read(f)
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                sum += (img.getRGB(x, y) & 0xff); x += 1
              }
              y += 1
            }
            GifFrame(r.media_id, f, img.getWidth, img.getHeight, sum)
          }
          iis.close()
          frames
        }
      }
  }

  // ---------------------------------------------------------------
  // Real WAV path (javax.sound.sampled — pure JVM, headless-safe:
  // parsing an AudioInputStream needs no audio device)
  // ---------------------------------------------------------------

  /** Closed-form PCM sample i of media `id` — shared by
    * [[synthesizeWav]] (which encodes it), the decode operators'
    * oracles (which recompute its sums in SQL), and the specs.
    * Operands are non-negative, so `%` is engine-independent. */
  @inline private[operators] def sampleValue(id: Long, i: Int): Int =
    (((id * 31L + i * 17L) % 4096L) - 2048L).toInt

  /** Per-id audio geometry: sample rate ∈ {8000, 12000, 16000} Hz and
    * sample count ∈ [64, 729] — arithmetic on the id like the PNG dims,
    * so every decoded quantity is oracle-recomputable. */
  @inline private[operators] def wavRate(id: Long): Int = (8000 + (id % 3) * 4000).toInt
  @inline private[operators] def wavSamples(id: Long): Int = ((id % 96) * 7 + 64).toInt

  /** Synthesize one REAL RIFF/WAVE payload per document: canonical
    * 44-byte PCM header (fmt chunk: PCM, mono, 16-bit, little-endian)
    * followed by the [[sampleValue]] samples. The output parses through
    * `javax.sound.sampled.AudioSystem` — a genuine decodable WAV, the
    * fixture for the real audio decode operators below. */
  def synthesizeWav(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.operators.NearDup.fanOut(docs.select(col("doc_id").cast("long"))).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val rate = wavRate(id)
          val n = wavSamples(id)
          val dataSize = n * 2
          val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1.toShort)             // PCM
            .putShort(1.toShort)             // mono
            .putInt(rate)
            .putInt(rate * 2)                // byte rate
            .putShort(2.toShort)             // block align
            .putShort(16.toShort)            // bits per sample
            .put("data".getBytes("US-ASCII")).putInt(dataSize)
          var i = 0
          while (i < n) { bb.putShort(sampleValue(id, i).toShort); i += 1 }
          MediaRecord(id, "audio/wav", bb.array())
        }
      }
  }

  /** Decoded-audio stats: REAL format fields from the parser (rate,
    * channels, bit depth, frame count) plus exact integer sample sums —
    * every column recomputable by the oracle from media_id alone, so a
    * header-layout/byte-order/sign defect anywhere in the
    * encode→decode round-trip is a hash mismatch. duration_us is exact
    * integer arithmetic (n·10⁶ div rate) — no float division to
    * diverge between engines. */
  case class WavMeta(media_id: Long, media_type: String, sample_rate: Int,
                     channels: Int, bits: Int, n_samples: Long,
                     duration_us: Long, sample_sum: Long, abs_sum: Long)

  /** REAL audio decode via `javax.sound.sampled` in the production
    * shape: mapPartitions, streaming iterator, no partition
    * materialization. Throws on an undecodable payload — silent nulls
    * would let a corrupt shard pass the gate. */
  def decodeWav(spark: SparkSession, media: DataFrame): Dataset[WavMeta] = {
    import spark.implicits._
    media.select("media_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions { it =>
        val readers = wavReaders()
        it.map { r =>
          val (fmt, pcm) = readWav(readers, r.payload, r.media_id)
          val n = pcm.length
          var sum = 0L; var abs = 0L
          var i = 0
          while (i < n) { sum += pcm(i); abs += math.abs(pcm(i)); i += 1 }
          val rate = fmt.getSampleRate.toInt
          WavMeta(r.media_id, r.media_type, rate, fmt.getChannels,
            fmt.getSampleSizeInBits, n.toLong,
            n.toLong * 1000000L / rate, sum, abs)
        }
      }
  }

  /** One row per fixed-size sample window: count, peak |amplitude|, and
    * the EXACT integer sum of squares — the audio feature-extraction
    * shape (VAD, loudness gates, spectral pre-filters all consume
    * windows like these). Windows are produced inside the decode task
    * with O(window) state — an entity's audio never materializes
    * per-row downstream, only per-window aggregates do. The core stays
    * integer-exact (|s| ≤ 2048 → Σs² fits a long comfortably); derived
    * floats like RMS belong in the consuming plan where the engine's
    * rounding convention applies uniformly. */
  case class WavWindow(media_id: Long, win_no: Int, n: Int, peak: Int, sq_sum: Long)

  def wavWindows(spark: SparkSession, media: DataFrame, windowSize: Int): Dataset[WavWindow] = {
    require(windowSize >= 1, s"windowSize must be >= 1, got $windowSize")
    import spark.implicits._
    media.select("media_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions { it =>
        val readers = wavReaders()
        it.flatMap { r =>
          val (_, pcm) = readWav(readers, r.payload, r.media_id)
          pcm.grouped(windowSize).zipWithIndex.map { case (w, k) =>
            var sq = 0L; var peak = 0
            var i = 0
            while (i < w.length) {
              val v = w(i).toInt
              sq += v.toLong * v
              if (math.abs(v) > peak) peak = math.abs(v)
              i += 1
            }
            WavWindow(r.media_id, k, w.length, peak, sq)
          }
        }
      }
  }

  /** Per-media audio fingerprint row: the 16-bit energy-delta hash as a
    * '0'/'1' bitstring plus the exact total |amplitude| sum it derives
    * from. */
  case class AudioFingerprint(media_id: Long, afp: String, abs_sum: Long)

  /** Perceptual audio fingerprint (energy-delta hash — the shape of
    * Haitsma–Kalker's audio fingerprinting, on band-less window
    * energies): split the decoded PCM into 17 equal-count windows by
    * the same exact integer index map the image paths use (sample k of
    * window w spans [w·n/17, (w+1)·n/17)), take each window's mean
    * |amplitude| as exact integer sums, and emit bit w = (energy of
    * window w+1 > energy of window w) — 16 bits per clip. Encoding
    * details (bitrate, container) wash out of window-energy TRENDS, so
    * re-encodes collide; the hash is then the BLOCKING KEY for audio
    * dedup — group-by-fingerprint, the dd01 exact-dedup shape with a
    * perceptual key, never pairwise sample comparison. The comparison
    * uses cross-multiplied integer sums (s·n vs s'·n'), so there is no
    * float division for engines to disagree on and a SQL oracle
    * recomputes the entire hash from media_id arithmetic. */
  def audioFingerprint(spark: SparkSession, media: DataFrame): Dataset[AudioFingerprint] = {
    import spark.implicits._
    media.select("media_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions { it =>
        val readers = wavReaders()
        it.map { r =>
          val (_, pcm) = readWav(readers, r.payload, r.media_id)
          val n = pcm.length
          val windows = 17
          val sums = new Array[Long](windows)
          val counts = new Array[Long](windows)
          var w = 0
          while (w < windows) {
            var i = w.toLong * n / windows
            val end = (w + 1).toLong * n / windows
            while (i < end) { sums(w) += math.abs(pcm(i.toInt)); i += 1 }
            counts(w) = end - w.toLong * n / windows
            w += 1
          }
          var abs = 0L
          sums.foreach(abs += _)
          val bits = new java.lang.StringBuilder(windows - 1)
          w = 0
          while (w < windows - 1) {
            // mean(w+1) > mean(w), cross-multiplied to stay integer-exact
            bits.append(
              if (sums(w + 1) * counts(w) > sums(w) * counts(w + 1)) '1' else '0')
            w += 1
          }
          AudioFingerprint(r.media_id, bits.toString, abs)
        }
      }
  }

  /** The provider list `AudioSystem.getAudioInputStream` consults,
    * resolved ONCE PER PARTITION — the audio twin of [[imageWriter]]:
    * AudioSystem re-walks the synchronized service registry on every
    * call, so a fanned-out decode stage serializes 32 tasks on the
    * registry lock (the exact per-row-ImageIO pathology fixed in §5a
    * of this round). Same providers tried in registry order ⇒
    * identical reader, identical decode. */
  private def wavReaders(): Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) buf += it.next()
    buf.toSeq
  }

  /** Parse a WAV payload through the real JVM audio stack: the
    * partition's resolved [[wavReaders]] take the place of
    * AudioSystem's per-call registry walk (first provider that accepts
    * the payload wins — AudioSystem's own contract), the AudioFormat
    * carries the header fields, and the PCM frames decode honoring the
    * format's declared byte order and sign — no hand-rolled header
    * offsets. */
  private def readWav(readers: Seq[javax.sound.sampled.spi.AudioFileReader],
                      payload: Array[Byte], mediaId: Long):
      (javax.sound.sampled.AudioFormat, Array[Short]) = {
    var ais: javax.sound.sampled.AudioInputStream = null
    val rit = readers.iterator
    while (ais == null && rit.hasNext) {
      val r = rit.next()
      try ais = r.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => ()
      }
    }
    if (ais == null)
      throw new javax.sound.sampled.UnsupportedAudioFileException(
        s"media $mediaId: no AudioFileReader accepts the payload")
    try {
      val fmt = ais.getFormat
      require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"media $mediaId: expected 16-bit mono PCM, got $fmt")
      val bytes = ais.readAllBytes()
      val out = new Array[Short](bytes.length / 2)
      var i = 0
      while (i < out.length) {
        val b0 = bytes(2 * i) & 0xff
        val b1 = bytes(2 * i + 1) & 0xff
        out(i) =
          (if (fmt.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0).toShort
        i += 1
      }
      (fmt, out)
    } finally ais.close()
  }

  /** One `ImageWriter` per partition — the write-side twin of
    * [[pngReader]]: `ImageIO.write` per row re-scans the synchronized
    * plugin registry AND (useCache=true default) spools every image
    * through a TEMP FILE ImageOutputStream; with a fanned-out codec
    * stage all tasks then serialize on the registry lock and /tmp
    * (observed as 1.6 s vs 7.7 s bimodal samples at sf0.1). Resolving
    * the writer once and writing through an explicit
    * MemoryCacheImageOutputStream produces byte-identical output
    * (same plugin, same default params) with no shared state. */
  private def imageWriter(format: String): javax.imageio.ImageWriter = {
    val ws = javax.imageio.ImageIO.getImageWritersByFormatName(format)
    require(ws.hasNext, s"JVM has no $format ImageWriter plugin")
    ws.next()
  }

  private def writeImage(writer: javax.imageio.ImageWriter,
                         img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(img)
    } finally { ios.close(); writer.reset() }
    bos.toByteArray
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
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis)
      val img = reader.read(0)
      require(img != null, s"undecodable PNG payload for media $mediaId")
      img
    } finally iis.close()
  }
}
