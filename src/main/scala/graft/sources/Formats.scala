package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

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

  /** Gzip-compressed JSON Lines — the shape crawl dumps arrive in.
    * Spark's text/json readers decompress by extension transparently;
    * the operational point is SPLITTABILITY: a .jsonl.gz file is ONE
    * task no matter its size (gzip has no sync points), so the 100 TB
    * discipline is many medium files (the writer below emits one per
    * partition), never one giant archive. Schema is explicit, as for
    * every file reader here. */
  def readJsonlGz(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJsonlGz(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(path)

  // ---------------------------------------------------------------
  // Avro (container files) — the row-oriented interchange format of
  // streaming/CDC ecosystems. Spark ships avro-core + avro-mapred but
  // not the spark-avro module in this image, so the source is built
  // directly on them: the read path uses AvroKeyInputFormat, which
  // SPLITS on the container's sync markers (a 10 GB avro file fans out
  // across tasks — unlike gzip text); the write path emits one
  // container file per partition from inside the tasks.
  // ---------------------------------------------------------------

  /** Catalyst → Avro schema for the practical interchange subset
    * (long/int/double/float/string/boolean/binary/date/timestamp-micros,
    * each nullable via union-with-null). Unsupported types fail loudly
    * at plan time, not as nulls in the lake. */
  private[sources] def avroSchemaFor(st: StructType): org.apache.avro.Schema = {
    import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
    val fields = SchemaBuilder.record("spark_row").namespace("graft").fields()
    st.fields.foldLeft(fields) { (fs, f) =>
      val base = f.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case DateType =>
          LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case TimestampType =>
          LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case other => throw new IllegalArgumentException(
          s"avro sink does not support column '${f.name}' of type $other")
      }
      if (f.nullable)
        fs.name(f.name)
          .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), base))
          .withDefault(null)
      else fs.name(f.name).`type`(base).noDefault()
    }.endRecord()
  }

  /** Inverse mapping for the read path. */
  private[sources] def structTypeFor(avro: org.apache.avro.Schema): StructType = {
    import org.apache.avro.{LogicalTypes, Schema}
    def nonNull(s: Schema): (Schema, Boolean) =
      if (s.getType == Schema.Type.UNION) {
        val ts = s.getTypes
        val nn = ts.toArray(Array.empty[Schema]).filter(_.getType != Schema.Type.NULL)
        require(nn.length == 1, s"unsupported avro union $s")
        (nn(0), ts.size > nn.length)
      } else (s, false)
    StructType(avro.getFields.toArray(Array.empty[org.apache.avro.Schema.Field]).map { f =>
      val (s, nullable) = nonNull(f.schema())
      val dt = (s.getType, Option(s.getLogicalType)) match {
        case (Schema.Type.LONG, Some(_: LogicalTypes.TimestampMicros)) => TimestampType
        case (Schema.Type.LONG, _)    => LongType
        case (Schema.Type.INT, Some(_: LogicalTypes.Date)) => DateType
        case (Schema.Type.INT, _)     => IntegerType
        case (Schema.Type.DOUBLE, _)  => DoubleType
        case (Schema.Type.FLOAT, _)   => FloatType
        case (Schema.Type.STRING, _)  => StringType
        case (Schema.Type.BOOLEAN, _) => BooleanType
        case (Schema.Type.BYTES, _)   => BinaryType
        case other => throw new IllegalArgumentException(
          s"avro source does not support field '${f.name}' of type $other")
      }
      StructField(f.name, dt, nullable)
    })
  }

  /** Write `df` as Avro container files, one per partition, written
    * INSIDE the tasks through the Hadoop filesystem of `path` (so the
    * same code targets file://, hdfs://, s3a://). Deflate-compressed,
    * sync-marked — the output re-reads SPLITTABLY via [[readAvro]].
    * Overwrite semantics like the built-in sinks. */
  def writeAvro(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val schema = df.schema
    val avroJson = avroSchemaFor(schema).toString
    val hadoopConf = df.sparkSession.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(hadoopConf)
    if (fs.exists(root)) fs.delete(root, true)
    fs.mkdirs(root)
    val pathStr = path
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      import org.apache.avro.Schema
      import org.apache.avro.file.DataFileWriter
      import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
      // Configuration built inside the task: picks up the cluster's
      // site config from the executor classpath, nothing to serialize.
      val conf = new org.apache.hadoop.conf.Configuration()
      val avro = new Schema.Parser().parse(avroJson)
      val part = new Path(f"$pathStr/part-$pid%05d.avro")
      val out = part.getFileSystem(conf).create(part, true)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avro))
      w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      w.create(avro, out)
      var n = 0L
      it.foreach { row =>
        val rec = new GenericData.Record(avro)
        var i = 0
        while (i < schema.length) {
          val v =
            if (row.isNullAt(i)) null
            else schema(i).dataType match {
              case DateType =>
                java.lang.Integer.valueOf(
                  row.getAs[java.sql.Date](i).toLocalDate.toEpochDay.toInt)
              case TimestampType =>
                val t = row.getAs[java.sql.Timestamp](i)
                java.lang.Long.valueOf(t.getTime * 1000L + t.getNanos / 1000 % 1000)
              case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
              case _ => row.get(i).asInstanceOf[AnyRef]
            }
          rec.put(i, v)
          i += 1
        }
        w.append(rec)
        n += 1
      }
      w.close()
      Iterator.single(n)
    }.count(): Unit
  }

  /** Read a directory of Avro container files as a DataFrame. Schema
    * comes from ONE file header (a driver-side metadata read, not a
    * data pass — the explicit-schema discipline still holds: Avro
    * containers carry their writer schema). The scan itself runs
    * through `AvroKeyInputFormat`, which splits each container on its
    * sync markers — block-parallel like parquet, the property that
    * makes Avro the right landing format for row-oriented feeds at
    * 100 TB (a gzip-jsonl landing zone cannot split). */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val first = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName).headOption
      .getOrElse(throw new IllegalArgumentException(s"no .avro files under $path"))
    val header = new org.apache.avro.file.DataFileStream(
      fs.open(first), new GenericDatumReader[GenericRecord]())
    val avroSchema = try header.getSchema finally header.close()
    val st = structTypeFor(avroSchema)
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("avro.schema.input.key", avroSchema.toString)
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[org.apache.avro.mapreduce.AvroKeyInputFormat[GenericRecord]],
      classOf[org.apache.avro.mapred.AvroKey[GenericRecord]],
      classOf[org.apache.hadoop.io.NullWritable],
      conf)
    val fields = st.fields
    val rows = rdd.mapPartitions(_.map { case (k, _) =>
      val rec = k.datum()
      Row.fromSeq(fields.indices.map { i =>
        val v = rec.get(i)
        if (v == null) null
        else fields(i).dataType match {
          case StringType => v.toString
          case DateType => java.sql.Date.valueOf(
            java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
          case TimestampType =>
            val micros = v.asInstanceOf[Long]
            val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
            t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
            t
          case BinaryType =>
            val bb = v.asInstanceOf[java.nio.ByteBuffer]
            val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
          case _ => v
        }
      })
    })
    spark.createDataFrame(rows, st)
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
