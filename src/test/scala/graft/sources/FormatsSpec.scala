package graft.sources

import org.apache.spark.sql.types._
import graft.SparkSpec

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private def data = Seq((1L, "ana", 0.5), (2L, "luis", 1.25), (3L, null, 2.0))
    .toDF("id", "name", "score")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath + "/out"

  test("csv round-trip preserves rows under an explicit schema") {
    val p = tmp("graft_csv")
    Formats.writeCsv(data, p)
    val back = Formats.readCsv(spark, p, schema)
    assert(back.schema == schema)
    assert(back.collect().map(_.toSeq).toSet == data.collect().map(_.toSeq).toSet)
  }

  test("jsonl round-trip preserves rows under an explicit schema") {
    val p = tmp("graft_jsonl")
    Formats.writeJsonl(data, p)
    val back = Formats.readJsonl(spark, p, schema)
    assert(back.collect().map(_.toSeq).toSet == data.collect().map(_.toSeq).toSet)
  }

  test("orc round-trip preserves rows and schema") {
    val p = tmp("graft_orc")
    Formats.writeOrc(data, p)
    val back = Formats.readOrc(spark, p)
    assert(back.collect().map(_.toSeq).toSet == data.collect().map(_.toSeq).toSet)
  }

  test("malformed csv rows become null rows under PERMISSIVE, scan survives") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badcsv").toFile
    val f = new java.io.File(dir, "data.csv")
    val w = new java.io.PrintWriter(f)
    w.println("id,name,score")
    w.println("1,ana,0.5")
    w.println("not_a_number,luis,oops") // malformed id and score
    w.println("3,zoe,2.0")
    w.close()
    val back = Formats.readCsv(spark, f.getAbsolutePath, schema)
    assert(back.count() == 3) // no rows dropped, no exception
    val ids = back.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(ids.count(_.isEmpty) == 1) // malformed field nulled, not fatal
  }

  test("readText: one row per line; wholeFile=true one row per file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_text")
    java.nio.file.Files.write(dir.resolve("a.txt"), "line1\nline2\n".getBytes)
    java.nio.file.Files.write(dir.resolve("b.txt"), "solo\n".getBytes)
    val lines = Formats.readText(spark, dir.toString)
    assert(lines.as[String].collect().sorted.toSeq == Seq("line1", "line2", "solo"))
    val whole = Formats.readText(spark, dir.toString, wholeFile = true)
    assert(whole.as[String].collect().map(_.linesIterator.size).sorted.toSeq == Seq(1, 2))
  }

  test("readBinaryFiles: raw bytes with metadata; glob prunes at listing time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bin")
    val png = Array[Byte](0x50, 0x4e, 0x47, 0x00, 0x7f)
    java.nio.file.Files.write(dir.resolve("img.png"), png)
    java.nio.file.Files.write(dir.resolve("notes.txt"), "skip me".getBytes)
    val all = Formats.readBinaryFiles(spark, dir.toString)
    assert(all.count() == 2)
    assert(all.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))
    val onlyPng = Formats.readBinaryFiles(spark, dir.toString, Some("*.png"))
      .select("content", "length").collect()
    assert(onlyPng.length == 1)
    assert(onlyPng.head.getAs[Array[Byte]]("content").toSeq == png.toSeq)
    assert(onlyPng.head.getAs[Long]("length") == png.length.toLong)
  }

  test("jdbcReadOptions builds a complete partitioned-read spec") {
    val opts = Formats.jdbcReadOptions("jdbc:postgresql://h/db", "turnos",
      "id", 1L, 1000000L, 32)
    assert(opts("partitionColumn") == "id")
    assert(opts("numPartitions") == "32")
    assert(opts("lowerBound") == "1" && opts("upperBound") == "1000000")
    assert(opts("fetchsize").toInt > 0)
  }

  test("mergeSchema read: additive evolution nulls exactly the pre-evolution rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_se").toString
    try {
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
        .write.mode("overwrite").parquet(dir)
      Seq((3L, 30.0, "seg")).toDF("id", "v", "extra")
        .write.mode("append").parquet(dir)
      val got = spark.read.option("mergeSchema", "true").parquet(dir)
        .select($"id", $"extra").as[(Long, Option[String])].collect().toMap
      assert(got == Map(1L -> None, 2L -> None, 3L -> Some("seg")))
    } finally graft.Scratch.delete(dir)
  }
}
