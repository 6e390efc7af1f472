package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def run(c: org.apache.spark.sql.Column, in: Seq[String]): Seq[Any] =
    in.toDF("v").select(c.as("r")).collect().toSeq.map(r => r.get(0))

  test("limpiarNombres trims, collapses whitespace, uppercases (Unicode)") {
    assert(run(Cleaning.limpiarNombres(col("v")),
      Seq("  maría   del  ñandú ", "a\t\tb", "YA LIMPIO")) ==
      Seq("MARÍA DEL ÑANDÚ", "A B", "YA LIMPIO"))
  }

  test("limpiarNombres propagates null (reference null guard, OP-08)") {
    val out = Seq[String](null).toDF("v")
      .select(Cleaning.limpiarNombres(col("v")).as("r")).collect()
    assert(out.head.isNullAt(0))
  }

  test("limpiarNombres is idempotent") {
    val once = Cleaning.limpiarNombres(col("v"))
    val twice = Cleaning.limpiarNombres(once)
    val df = Seq("  a   b  c ", "x", "  Ñ  ").toDF("v")
    assert(df.select(once).collect().toSeq == df.select(twice).collect().toSeq)
  }

  test("firstToken takes the first space-delimited token (OP-27)") {
    assert(run(Cleaning.firstToken(col("v")), Seq("MARIA LUISA PEREZ", "SOLO")) ==
      Seq("MARIA", "SOLO"))
  }

  test("normalizeUnicode composes/decomposes; stripAccents drops marks") {
    // "á" precomposed (U+00E1) vs decomposed ("a" + U+0301)
    val r = Seq(("á", "café ñandú")).toDF("dec", "acc")
      .select(
        Cleaning.normalizeUnicode(col("dec"), "NFC").as("nfc"),
        Cleaning.normalizeUnicode(lit("á"), "NFD").as("nfd"),
        Cleaning.stripAccents(col("acc")).as("plain"))
      .collect().head
    assert(r.getString(0) == "á")      // composed to single code point
    assert(r.getString(1) == "á")     // decomposed back
    assert(r.getString(2) == "cafe nandu")  // marks stripped (ñ → n)
  }

  test("normalizeUnicode rejects an invalid form at analysis time") {
    val df = Seq("x").toDF("v")
    val e = intercept[Exception] {
      df.select(Cleaning.normalizeUnicode(col("v"), "NFX")).collect()
    }
    // must fail during analysis (type-check message), not per-row
    assert(e.getMessage.contains("NFC") || e.getMessage.contains("form"),
      s"expected analysis-time form error, got: ${e.getMessage}")
  }

  test("nonEmpty: null and blank are empty; '0' is NOT (documented divergence)") {
    val df = Seq(("a", "x"), ("b", "   "), ("c", null), ("d", "0"))
      .toDF("k", "v")
    assert(df.filter(Cleaning.nonEmpty(col("v"))).select("k")
      .as[String].collect().sorted.toSeq == Seq("a", "d"))
  }
}
