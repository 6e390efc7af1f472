package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asBinary(
    Seq((1L, "hello world"), (2L, "tiny"), (3L, "x" * 600))
      .toDF("doc_id", "text"))

  private def docs = Seq((1L, "a"), (2L, "b"), (17L, "c"), (300L, "d"))
    .toDF("doc_id", "text")

  /** Reference pixel/dim model shared with the oracles. */
  private def dims(id: Long): (Int, Int) =
    ((id % 16 + 4).toInt, ((id / 16) % 8 + 4).toInt)
  private def pxSum(id: Long, w: Int, h: Int,
                    sx: Int => Int = identity, sy: Int => Int = identity): Long =
    (for (y <- 0 until h; x <- 0 until w)
      yield ((id + 7L * sx(x) + 13L * sy(y)) % 256L)).sum

  test("decodeMetaExpr: payload length and checksum") {
    val out = Multimodal.decodeMetaExpr(media).orderBy("media_id").collect()
    assert(out(0).getLong(2) == 11L)
    assert(out(0).getString(3).length == 32)
    assert(out.map(_.schema.fieldNames.toSeq).head ==
      Seq("media_id", "media_type", "n_bytes", "checksum"))
  }

  test("synthesizePng emits genuine PNGs: magic bytes + IHDR dims match the id model") {
    val recs = Multimodal.synthesizePng(spark, docs).collect()
      .map(r => r.media_id -> r.payload).toMap
    assert(recs.keySet == Set(1L, 2L, 17L, 300L))
    recs.foreach { case (id, png) =>
      // PNG signature
      assert(png.take(8).map(_ & 0xff).toSeq ==
        Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
      // IHDR: width bytes 16-19, height bytes 20-23, big-endian
      def be(off: Int) = (0 until 4).map(i => (png(off + i) & 0xff) << (8 * (3 - i))).sum
      val (w, h) = dims(id)
      assert(be(16) == w && be(20) == h, s"IHDR dims for media $id")
    }
  }

  test("decodePng round-trip: real codec recovers exact dims and pixel sums") {
    val out = Multimodal.decodePng(spark,
      Multimodal.synthesizePng(spark, docs).toDF()).collect()
      .map(r => r.media_id -> r).toMap
    out.foreach { case (id, m) =>
      val (w, h) = dims(id)
      assert(m.width == w && m.height == h)
      assert(m.n_pixels == w.toLong * h)
      assert(m.px_sum == pxSum(id, w, h), s"pixel sum for media $id")
    }
  }

  test("decodePng rejects an undecodable payload instead of passing nulls") {
    val bad = Seq((9L, "image/png", Array[Byte](1, 2, 3)))
      .toDF("media_id", "media_type", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodePng(spark, bad).collect()
    }
    assert(e.getMessage != null)
  }

  test("resizePng: real decode→resample→re-encode→re-decode with exact NN pixel map") {
    val out = Multimodal.resizePng(spark,
      Multimodal.synthesizePng(spark, docs).toDF(), 8).collect()
      .map(r => r.media_id -> r).toMap
    out.foreach { case (id, r) =>
      val (w, h) = dims(id)
      assert(r.width == w && r.height == h)
      val mx = math.max(w, h)
      val (nw, nh) =
        if (mx <= 8) (w, h)
        else (math.max(1, w * 8 / mx), math.max(1, h * 8 / mx))
      assert(r.new_width == nw && r.new_height == nh)
      assert(math.max(r.new_width, r.new_height) <= 8 || mx <= 8)
      assert(r.px_sum == pxSum(id, nw, nh, x => x * w / nw, y => y * h / nh),
        s"resampled pixel sum for media $id")
    }
  }

  test("extractFeatures: 16-bin normalized byte histogram, ANN-ready shape") {
    val f = Multimodal.extractFeatures(spark, media).collect()
      .map(r => r.media_id -> r.features).toMap
    assert(f.values.forall(_.length == 16))
    // histogram is normalized: sums to ~1
    f.values.foreach(h => assert(math.abs(h.sum - 1f) < 1e-5))
    // "x"*600 is all 'x' (0x78 -> bin 7)
    assert(f(3L)(7) == 1f)
  }

  test("sampleFrames: one frame per stride, byte offsets aligned") {
    val out = Multimodal.sampleFrames(media, 256)
      .filter(col("media_id") === 3L)
      .select("frame_no", "byte_offset").as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((0L, 0L), (1L, 256L), (2L, 512L))) // 600 bytes -> 3 frames
  }

  test("aHashPng: decoded hash matches the closed-form model bit for bit") {
    val out = Multimodal.aHashPng(spark,
      Multimodal.synthesizePng(spark, docs).toDF()).collect()
      .map(r => r.media_id -> r).toMap
    out.foreach { case (id, r) =>
      val (w, h) = dims(id)
      val px = for (y <- 0 until 8; x <- 0 until 8)
        yield ((id + 7L * (x * w / 8) + 13L * (y * h / 8)) % 256L).toInt
      val mu = px.map(_.toLong).sum / 64.0
      val expected = px.map(v => if (v > mu) '1' else '0').mkString
      assert(r.ahash.length == 64)
      assert(r.ahash == expected, s"aHash bits for media $id")
      assert(r.mean_px == mu)
    }
  }

  test("aHashPng: perceptually identical images (ids 256 apart) collide; different images don't") {
    // id and id+256 share dims AND every pixel value (+256 ≡ 0 mod 256),
    // so their PNGs are pixel-identical — the hash MUST collide. id and
    // id+1 differ in width and content — with overwhelming likelihood
    // the 64-bit hash separates them (verified deterministically here).
    val quad = Seq((40L, "a"), (296L, "b"), (41L, "c"))
      .toDF("doc_id", "text")
    val h = Multimodal.aHashPng(spark,
      Multimodal.synthesizePng(spark, quad).toDF()).collect()
      .map(r => r.media_id -> r.ahash).toMap
    assert(h(40L) == h(296L), "identical rasters must share the aHash")
    assert(h(40L) != h(41L), "these two distinct rasters must separate")
  }

  test("synthesizeJpeg emits genuine JPEGs; decoded blocks stay inside the aHash margin") {
    val recs = Multimodal.synthesizeJpeg(spark, docs).collect()
    recs.foreach { r =>
      // SOI marker: a real JPEG container, not a stub
      assert((r.payload(0) & 0xff) == 0xff && (r.payload(1) & 0xff) == 0xd8,
        s"media ${r.media_id} missing JPEG SOI marker")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      assert(img.getWidth == 64 && img.getHeight == 64)
      val raster = img.getRaster
      // every pixel of every flat DCT-aligned block decodes within a few
      // gray levels of its intended value — far inside the ±64 margin
      for (y <- 0 until 64; x <- 0 until 64) {
        val want = if (Multimodal.jpegBlockHigh(r.media_id, x / 8, y / 8)) 192 else 64
        val got = raster.getSample(x, y, 0)
        assert(math.abs(got - want) < 16,
          s"media ${r.media_id} px($x,$y): decoded $got vs intended $want")
      }
    }
  }

  test("aHashJpeg: decoded hash equals the closed-form model bit for bit (loss-immune)") {
    val out = Multimodal.aHashJpeg(spark,
      Multimodal.synthesizeJpeg(spark, docs).toDF()).collect()
    out.foreach { r =>
      val expected = (for (y <- 0 until 8; x <- 0 until 8)
        yield if (Multimodal.jpegBlockHigh(r.media_id, x, y)) '1' else '0').mkString
      assert(r.ahash == expected, s"JPEG aHash bits for media ${r.media_id}")
    }
    // ids that agree on (id mod 4, id div 4 mod 4) paint identical block
    // patterns -> hash collides; a pattern-changing id must separate
    val trio = Seq((3L, "a"), (19L, "b"), (4L, "c")).toDF("doc_id", "text")
    val h = Multimodal.aHashJpeg(spark,
      Multimodal.synthesizeJpeg(spark, trio).toDF()).collect()
      .map(r => r.media_id -> r.ahash).toMap
    assert(h(3L) == h(19L), "same block pattern must share the hash")
    assert(h(3L) != h(4L), "different block patterns must separate")
  }

  test("synthesizeGif emits genuine multi-frame GIFs: magic bytes + frame count match the id model") {
    val recs = Multimodal.synthesizeGif(spark, docs).collect()
      .map(r => r.media_id -> r.payload).toMap
    assert(recs.keySet == Set(1L, 2L, 17L, 300L))
    recs.foreach { case (id, gif) =>
      assert(new String(gif, 0, 6, "US-ASCII").startsWith("GIF8"))
      // independent frame count through a fresh reader
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(gif))
      val r = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      r.setInput(iis)
      assert(r.getNumImages(true) == (id % 4 + 2).toInt, s"frame count for media $id")
      iis.close()
    }
  }

  test("decodeGifFrames round-trip: every frame's dims and pixel sum match the model") {
    val out = Multimodal.decodeGifFrames(spark,
      Multimodal.synthesizeGif(spark, docs).toDF()).collect()
      .groupBy(_.media_id)
    docs.select("doc_id").as[Long].collect().foreach { id =>
      val w = (id % 12 + 4).toInt
      val h = ((id / 12) % 6 + 4).toInt
      val frames = out(id).sortBy(_.frame_no)
      assert(frames.length == (id % 4 + 2).toInt)
      frames.foreach { fr =>
        assert(fr.width == w && fr.height == h)
        val expect = (for (y <- 0 until h; x <- 0 until w)
          yield ((id + 5L * fr.frame_no + 7L * x + 13L * y) % 256L)).sum
        assert(fr.px_sum == expect,
          s"pixel sum for media $id frame ${fr.frame_no}")
      }
    }
  }

  /** Reference sample model shared with the oracles. */
  private def samples(id: Long): Array[Int] =
    Array.tabulate(((id % 96) * 7 + 64).toInt)(i =>
      (((id * 31L + i * 17L) % 4096L) - 2048L).toInt)

  test("synthesizeWav emits genuine RIFF/WAVE: magic bytes + format fields match the id model") {
    val recs = Multimodal.synthesizeWav(spark, docs).collect()
      .map(r => r.media_id -> r.payload).toMap
    assert(recs.keySet == Set(1L, 2L, 17L, 300L))
    recs.foreach { case (id, wav) =>
      assert(new String(wav, 0, 4, "US-ASCII") == "RIFF")
      assert(new String(wav, 8, 4, "US-ASCII") == "WAVE")
      // independent parse through the real JVM audio stack
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val fmt = ais.getFormat
      assert(fmt.getSampleRate.toInt == 8000 + (id % 3).toInt * 4000)
      assert(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16)
      assert(ais.getFrameLength == (id % 96) * 7 + 64, s"frame count for media $id")
      ais.close()
    }
  }

  test("decodeWav round-trip: real parser recovers exact format fields and sample sums") {
    val out = Multimodal.decodeWav(spark,
      Multimodal.synthesizeWav(spark, docs).toDF()).collect()
      .map(r => r.media_id -> r).toMap
    out.foreach { case (id, m) =>
      val sv = samples(id)
      assert(m.sample_rate == 8000 + (id % 3).toInt * 4000)
      assert(m.channels == 1 && m.bits == 16)
      assert(m.n_samples == sv.length.toLong)
      assert(m.duration_us == sv.length.toLong * 1000000L / m.sample_rate)
      assert(m.sample_sum == sv.map(_.toLong).sum, s"sample sum for media $id")
      assert(m.abs_sum == sv.map(v => math.abs(v).toLong).sum)
    }
  }

  test("decodeWav rejects an undecodable payload instead of passing nulls") {
    val bad = Seq((9L, "audio/wav", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)))
      .toDF("media_id", "media_type", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeWav(spark, bad).collect()
    }
    assert(e.getMessage != null)
  }

  test("audioFingerprint: bits match the closed-form energy-delta model") {
    val out = Multimodal.audioFingerprint(spark,
      Multimodal.synthesizeWav(spark, docs).toDF()).collect()
      .map(r => r.media_id -> r).toMap
    docs.select("doc_id").as[Long].collect().foreach { id =>
      val sv = samples(id)
      val n = sv.length
      val sums = new Array[Long](17)
      val counts = new Array[Long](17)
      for (w <- 0 until 17) {
        val from = w.toLong * n / 17; val to = (w + 1).toLong * n / 17
        counts(w) = to - from
        for (i <- from until to) sums(w) += math.abs(sv(i.toInt))
      }
      val bits = (0 until 16).map(w =>
        if (sums(w + 1) * counts(w) > sums(w) * counts(w + 1)) '1' else '0').mkString
      assert(out(id).afp == bits, s"fingerprint for media $id")
      assert(out(id).abs_sum == sums.sum)
    }
  }

  test("audioFingerprint: perceptually identical clips (ids 12288 apart) collide; different don't") {
    // lcm(4096, 96, 3) = 12288: ids that far apart share rate, length,
    // and every sample — byte-identical WAVs, the audio re-encode case.
    // id=200 is long enough (120 samples) that its |amplitude| curve
    // wraps mid-clip, giving a non-trivial bit pattern; id=1's curve is
    // monotone (all-zero fingerprint), so the two must separate.
    val trio = Seq((200L, "a"), (12488L, "b"), (1L, "c")).toDF("doc_id", "text")
    val fp = Multimodal.audioFingerprint(spark,
      Multimodal.synthesizeWav(spark, trio).toDF()).collect()
      .map(r => r.media_id -> r.afp).toMap
    assert(fp(200L) == fp(12488L), "identical PCM must share the fingerprint")
    assert(fp(200L) != fp(1L), "these two distinct clips must separate")
  }

  test("wavWindows: per-window count/peak/Σs² match the model; state bounded by window") {
    val out = Multimodal.wavWindows(spark,
      Multimodal.synthesizeWav(spark, docs).toDF(), 256).collect()
      .groupBy(_.media_id)
    docs.select("doc_id").as[Long].collect().foreach { id =>
      val sv = samples(id)
      val expected = sv.grouped(256).zipWithIndex.toSeq
      val got = out(id).sortBy(_.win_no)
      assert(got.length == expected.length, s"window count for media $id")
      expected.foreach { case (w, k) =>
        val g = got(k)
        assert(g.n == w.length && g.win_no == k)
        assert(g.peak == w.map(math.abs).max)
        assert(g.sq_sum == w.map(v => v.toLong * v).sum)
      }
    }
  }
}
