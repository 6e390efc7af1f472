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

  test("sampleFrames: one frame per stride, byte offsets aligned") {
    val out = Multimodal.sampleFrames(media, 256)
      .filter(col("media_id") === 3L)
      .select("frame_no", "byte_offset").as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((0L, 0L), (1L, 256L), (2L, 512L))) // 600 bytes -> 3 frames
  }
}
