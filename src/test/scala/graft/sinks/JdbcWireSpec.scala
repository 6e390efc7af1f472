package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.his.TurnosPipeline
import graft.sources.Formats

/** REAL JDBC wire test over embedded Apache Derby (the one JDBC driver
  * shipped in the image): the full OP-01/02/03 path — transactional DDL
  * recreate → batched multi-connection write → partitioned read — with
  * row-set parity against the same data published to parquet. The
  * PostgreSQL statement list stays the reference spec; Derby runs the
  * dialect-forced variant through the SAME one-transaction executor.
  *
  * Derby uppercases unquoted identifiers while Spark's JDBC writer
  * quotes column names, so frames are uppercased before the write and
  * lowercased after the read.
  */
class JdbcWireSpec extends SparkSpec {

  System.setProperty("derby.stream.error.file", "/tmp/derby.log")

  // Spark's built-in DerbyDialect maps StringType to CLOB, and Derby
  // refuses to bind CLOB parameters against VARCHAR columns (which the
  // DDL must use — Derby cannot index or UNIQUE a CLOB). Register a
  // higher-priority dialect mapping strings to VARCHAR; every other
  // type falls through to the built-in dialect.
  org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(
    new org.apache.spark.sql.jdbc.JdbcDialect {
      override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")
      override def getJDBCType(dt: org.apache.spark.sql.types.DataType) = dt match {
        case org.apache.spark.sql.types.StringType =>
          Some(org.apache.spark.sql.jdbc.JdbcType("VARCHAR(255)", java.sql.Types.VARCHAR))
        case _ => None
      }
    })

  private def upper(df: org.apache.spark.sql.DataFrame) =
    df.select(df.columns.map(c => col(c).as(c.toUpperCase)): _*)
  private def lower(df: org.apache.spark.sql.DataFrame) =
    df.select(df.columns.map(c => col(c).as(c.toLowerCase)): _*)

  test("Derby wire: one-txn DDL recreate -> batched write -> partitioned read -> parquet parity") {
    val url = "jdbc:derby:memory:graftwire;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      JdbcSchema.recreate(conn, JdbcSchema.derbyStatements("graft_t"))

      val wide = TurnosPipeline.wideExtract(spark, sf0001)
      val paciente = TurnosPipeline.paciente(wide)
      val turno = TurnosPipeline.turno(wide, paciente)

      // FK dependency order, batched, 4 concurrent connections each
      Formats.writeJdbc(upper(paciente), url, "graft_t.paciente",
        batchSize = 500, numPartitions = 4)
      Formats.writeJdbc(upper(turno), url, "graft_t.turno",
        batchSize = 500, numPartitions = 4)

      // partitioned range read on the dense id — the OP-01 scale shape
      val nTurnos = turno.count()
      // fecha_alta reaches the pipeline as plain TimestampType (Tables
      // normalizes the fixtures' TIMESTAMP_NTZ at load, session TZ =
      // UTC), so the default TIMESTAMP read-back type already matches
      // the lake side — no preferTimestampNTZ.
      val opts = Formats.jdbcReadOptions(url, "graft_t.turno", "ID", 1L, nTurnos, 4)
      val back = lower(Formats.readJdbc(spark, opts))
      assert(back.rdd.getNumPartitions == 4, "read must be range-partitioned")

      // parity vs the lake publish of the same table
      val root = java.nio.file.Files.createTempDirectory("graft_wire").toFile.getAbsolutePath
      Publish.publishTables(spark, Map("turno" -> turno), root, "1")
      val published = Publish.readTable(spark, root, "turno")

      val cols = turno.columns.sorted.map(col)
      val fromDb = back.select(cols: _*).collect().map(_.toSeq).toSet
      val fromLake = published.select(cols: _*).collect().map(_.toSeq).toSet
      assert(fromDb.size == nTurnos)
      assert(fromDb == fromLake, "JDBC roundtrip must match the parquet publish")

      // paciente FK integrity actually enforced on the wire: an orphan row
      // must be rejected by the database, not silently inserted
      val orphan = upper(turno.limit(1)
        .withColumn("id", lit(999999L)).withColumn("paciente_id", lit(-1L)))
      intercept[Exception] {
        Formats.writeJdbc(orphan, url, "graft_t.turno", numPartitions = 1)
      }
    } finally conn.close()
  }

  test("Derby-dialect rendering of the reference schema is valid DDL on a real database") {
    val url = "jdbc:derby:memory:graftdialect;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      JdbcSchema.recreate(conn,
        JdbcSchema.Derby.ddl("graft_ref", JdbcSchema.referenceTables))
      val rs = conn.getMetaData.getTables(null, "GRAFT_REF", null, null)
      val tables = Iterator.continually(rs).takeWhile(_.next())
        .map(_.getString("TABLE_NAME").toLowerCase).toSet
      rs.close()
      assert(tables == Set("paciente", "turno", "prestacion", "prestacion_x_turno"))
    } finally conn.close()
  }

  test("failed DDL batch rolls back atomically, leaving no partial schema") {
    val url = "jdbc:derby:memory:graftbad;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val bad = Seq(
        "CREATE SCHEMA graft_bad",
        "CREATE TABLE graft_bad.t1 (id BIGINT NOT NULL PRIMARY KEY)",
        "THIS IS NOT SQL")
      intercept[java.sql.SQLException] {
        JdbcSchema.recreate(conn, bad)
      }
      val rs = conn.getMetaData.getTables(null, "GRAFT_BAD", "T1", null)
      assert(!rs.next(), "rolled-back DDL must leave no tables behind")
      rs.close()
      assert(conn.getAutoCommit, "original autoCommit must be restored")
    } finally conn.close()
  }
}
