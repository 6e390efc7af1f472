package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  private val wide = Seq(
    (1L, "  a ", null, "c"),
    (2L, "", "b", "   "),
    (3L, null, null, null),
  ).toDF("id", "prestacion0", "prestacion1", "prestacion2")

  test("unpivotNonEmpty: gates null/blank, trims, keeps slot ordinal") {
    val out = Reshape.unpivotNonEmpty(wide, Seq("id"),
      Seq("prestacion0", "prestacion1", "prestacion2"), "slot", "nombre")
      .select("id", "slot", "nombre").as[(Long, Int, String)].collect().toSet
    assert(out == Set((1L, 0, "a"), (1L, 2, "c"), (2L, 1, "b")))
  }

  test("pivotSlots inverts unpivot for ranked values") {
    val long = Seq((1L, 0, "a"), (1L, 1, "b"), (2L, 0, "x")).toDF("id", "slot", "v")
    val out = Reshape.pivotSlots(long, "id", col("v"),
      Seq(col("slot").asc), 3, "s").orderBy("id").collect()
    assert(out(0).getString(1) == "a" && out(0).getString(2) == "b" && out(0).isNullAt(3))
    assert(out(1).getString(1) == "x" && out(1).isNullAt(2))
  }

  test("unpivot→pivot round-trip preserves non-empty slot contents") {
    val clean = Seq((1L, "a", "b", "c"), (2L, "x", "y", "z"))
      .toDF("id", "prestacion0", "prestacion1", "prestacion2")
    val long = Reshape.unpivotNonEmpty(clean, Seq("id"),
      Seq("prestacion0", "prestacion1", "prestacion2"), "slot", "nombre")
    val back = Reshape.pivotSlots(long, "id", col("nombre"),
      Seq(col("slot").asc), 3, "prestacion")
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ==
      clean.orderBy("id").collect().map(_.toSeq).toSeq)
  }
}
