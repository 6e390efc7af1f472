package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File and relational source/sink helpers (SURVEY OP-01/02/04).
  *
  * File readers take an EXPLICIT schema: schema inference is a full
  * extra pass over the data (prohibitive at 100 TB) and type-unstable
  * across samples; production tables declare their shape.
  */
object Formats {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      // malformed rows go to a null-row instead of failing the scan;
      // switch to FAILFAST for validation runs.
      .option("mode", "PERMISSIVE")
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  /** ORC — the other columnar lake format Spark supports natively. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** JSON Lines (one object per line — splittable, unlike json arrays). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Raw text ingestion: one row per LINE (`value: string`) — splittable,
    * the crawl-dump shape; `wholeFile = true` reads one row per FILE
    * (document-per-file corpora; non-splittable, so pair it with many
    * input files, not one giant one). */
  def readText(spark: SparkSession, path: String,
               wholeFile: Boolean = false): DataFrame =
    spark.read.option("wholetext", wholeFile.toString).text(path)

  /** Multimodal ingestion: Spark's `binaryFile` source reads raw
    * image/audio/video files into (path, modificationTime, length,
    * content: binary) rows — the entry point of the Multimodal family
    * (decode/feature steps consume the `content` column). Per-file
    * rows are non-splittable; `glob` (e.g. `*.png`) prunes at FILE
    * LISTING time, before any bytes are read — at 100 TB the listing
    * filter is the difference between scanning a prefix and scanning
    * a lake. */
  def readBinaryFiles(spark: SparkSession, path: String,
                      glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
  }

  /** Partitioned-JDBC read options — the OP-01 scale path. The reference
    * does ONE single-threaded fetchAll (EtlHisTurnosCommand.php:323-324);
    * at scale the read must be split into `numPartitions` range slices
    * of an indexed numeric column so every executor pulls its own slice
    * concurrently. Returned as options for `spark.read.format("jdbc")`. */
  def jdbcReadOptions(url: String, table: String, partitionCol: String,
                      lowerBound: Long, upperBound: Long,
                      numPartitions: Int,
                      fetchSize: Int = 10000): Map[String, String] = Map(
    "url" -> url,
    "dbtable" -> table,
    "partitionColumn" -> partitionCol,
    "lowerBound" -> lowerBound.toString,
    "upperBound" -> upperBound.toString,
    "numPartitions" -> numPartitions.toString,
    "fetchsize" -> fetchSize.toString,
  )

  /** Partitioned JDBC source (untestable here — no DB in the container;
    * the options builder above carries the logic and is unit-tested). */
  def readJdbc(spark: SparkSession, options: Map[String, String]): DataFrame =
    spark.read.format("jdbc").options(options).load()

  /** Bulk JDBC sink: batched inserts, `numPartitions` concurrent
    * connections — replaces the reference's one-row-per-statement load
    * (2–36 round trips per row, SURVEY §6). */
  def writeJdbc(df: DataFrame, url: String, table: String,
                batchSize: Int = 10000, numPartitions: Int = 8): Unit =
    df.repartition(numPartitions).write.mode("append")
      .format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .save()
}
