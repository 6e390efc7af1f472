package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asBinary(
    Seq((1L, "hello world"), (2L, "tiny"), (3L, "x" * 600))
      .toDF("doc_id", "text"))

  test("decodeMetaExpr: length, checksum, deterministic stub dims in range") {
    val out = Multimodal.decodeMetaExpr(media).orderBy("media_id").collect()
    assert(out(0).getLong(2) == 11L)
    assert(out(0).getString(3).length == 32)
    out.foreach { r =>
      assert(r.getInt(4) >= 64 && r.getInt(4) < 1920)  // width
      assert(r.getInt(5) >= 64 && r.getInt(5) < 1080)  // height
    }
  }

  test("mapPartitions decode path agrees with the expression path") {
    val viaExpr = Multimodal.decodeMetaExpr(media).orderBy("media_id")
      .collect().map(_.toSeq).toSeq
    val viaPart = Multimodal.decodeMetaPartitions(spark, media).toDF()
      .select("media_id", "media_type", "n_bytes", "checksum", "width", "height")
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(viaExpr == viaPart)
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

  test("resize: dims capped at maxDim, aspect preserved, payload shrunk") {
    val out = Multimodal.resize(spark, media, 64).collect()
      .map(r => r.media_id -> r).toMap
    val orig = Multimodal.decodeMetaExpr(media).collect()
      .map(r => r.getLong(0) -> (r.getInt(4), r.getInt(5))).toMap
    out.foreach { case (id, r) =>
      assert(math.max(r.width, r.height) <= 64)
      val (w, h) = orig(id)
      // aspect ratio preserved within integer rounding
      assert(math.abs(r.width.toDouble / r.height - w.toDouble / h) < 0.2)
      assert(r.payload.nonEmpty)
    }
  }

  test("sampleFrames: one frame per stride, byte offsets aligned") {
    val out = Multimodal.sampleFrames(media, 256)
      .filter(col("media_id") === 3L)
      .select("frame_no", "byte_offset").as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((0L, 0L), (1L, 256L), (2L, 512L))) // 600 bytes -> 3 frames
  }
}
