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

  test("repeatedDimJoin ≡ unpivot → single join → pivot (OP-13)") {
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "nombre")
    val direct = Reshape.repeatedDimJoin(wide, dim, "nombre", "id",
      Seq("prestacion0", "prestacion1", "prestacion2"), "p")
      .select("id", "p0", "p1", "p2")
    // equivalent path: unpivot, join once, pivot back by slot
    val long = Reshape.unpivotNonEmpty(wide, Seq("id"),
      Seq("prestacion0", "prestacion1", "prestacion2"), "slot", "v")
      .join(dim.withColumnRenamed("id", "did"), col("v") === col("nombre"), "left")
    val pivoted = long.groupBy(col("id"))
      .agg(
        max(when(col("slot") === 0, col("did"))).as("p0"),
        max(when(col("slot") === 1, col("did"))).as("p1"),
        max(when(col("slot") === 2, col("did"))).as("p2"))
    val viaUnpivot = wide.select("id").join(pivoted, Seq("id"), "left")
    assert(direct.orderBy("id").collect().map(_.toSeq).toSeq ==
      viaUnpivot.orderBy("id").collect().map(_.toSeq).toSeq)
  }

  test("repeatedDimJoin fails fast on an over-sized dim instead of collecting it") {
    val bigDim = (1L to 100L).map(i => (i, s"n$i")).toDF("id", "nombre")
    val e = intercept[IllegalArgumentException] {
      Reshape.repeatedDimJoin(wide, bigDim, "nombre", "id",
        Seq("prestacion0"), "p", maxDimRows = 50)
    }
    assert(e.getMessage.contains("not broadcast-sized"))
  }

  test("repeatedDimJoin trips the BYTE guard on wide rows far below the row cap") {
    val fat = "x" * 10000
    val fatDim = (1L to 2000L).map(i => (i, fat + i)).toDF("id", "nombre")
    val e = intercept[IllegalArgumentException] {
      Reshape.repeatedDimJoin(wide, fatDim, "nombre", "id",
        Seq("prestacion0"), "p", maxDimRows = 2000000, maxDimBytes = 1L << 20)
    }
    assert(e.getMessage.contains("not broadcast-sized"))
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
