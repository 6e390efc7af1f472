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

  test("jdbcReadOptions builds a complete partitioned-read spec") {
    val opts = Formats.jdbcReadOptions("jdbc:postgresql://h/db", "turnos",
      "id", 1L, 1000000L, 32)
    assert(opts("partitionColumn") == "id")
    assert(opts("numPartitions") == "32")
    assert(opts("lowerBound") == "1" && opts("upperBound") == "1000000")
    assert(opts("fetchsize").toInt > 0)
  }
}
