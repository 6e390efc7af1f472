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

  test("avro round-trip: full type surface incl. nulls, date, timestamp, binary") {
    import org.apache.spark.sql.Row
    val p = tmp("graft_avro")
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", IntegerType), StructField("x", DoubleType),
      StructField("f", FloatType), StructField("s", StringType),
      StructField("b", BooleanType), StructField("raw", BinaryType),
      StructField("d", DateType), StructField("ts", TimestampType)))
    val ts = java.sql.Timestamp.valueOf("2024-03-05 06:07:08.123456")
    val rows = Seq(
      Row(1L, 7, 2.5, 1.5f, "hola", true, Array[Byte](1, 2, 3),
        java.sql.Date.valueOf("2024-03-05"), ts),
      Row(2L, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), st)
    Formats.writeAvro(df, p)
    // genuine Avro container files: OBJ1 magic
    val files = new java.io.File(p).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.nonEmpty)
    val magic = java.nio.file.Files.readAllBytes(files.head.toPath).take(4)
    assert(magic.sameElements(Array[Byte]('O', 'b', 'j', 1)))
    val back = Formats.readAvro(spark, p)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      st.map(f => (f.name, f.dataType)))
    val got = back.collect().sortBy(_.getLong(0))
    assert(got.length == 2)
    val r = got(0)
    assert(r.getLong(0) == 1L && r.getInt(1) == 7 && r.getDouble(2) == 2.5 &&
      r.getFloat(3) == 1.5f && r.getString(4) == "hola" && r.getBoolean(5) &&
      r.getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 3) &&
      r.getDate(7) == java.sql.Date.valueOf("2024-03-05") &&
      r.getTimestamp(8) == ts, s"row mismatch: $r")
    assert((1 to 8).forall(got(1).isNullAt), "null row must round-trip as nulls")
    // unsupported type fails loudly at plan time
    intercept[IllegalArgumentException] {
      Formats.writeAvro(
        data.select(org.apache.spark.sql.functions.array($"id").as("a")),
        tmp("graft_avro_bad"))
    }
  }

  test("gzip-jsonl round-trip: per-partition .gz files, explicit schema read") {
    val p = tmp("graft_gzjl")
    Formats.writeJsonlGz(data.repartition(2), p)
    val gz = new java.io.File(p).listFiles().filter(_.getName.endsWith(".json.gz"))
    assert(gz.length == 2, "one gzip member per partition (file-count parallelism)")
    val got = Formats.readJsonlGz(spark, p, schema)
      .as[(Long, Option[String], Double)].collect().toSet
    assert(got == Set((1L, Some("ana"), 0.5), (2L, Some("luis"), 1.25), (3L, None, 2.0)))
  }
}
