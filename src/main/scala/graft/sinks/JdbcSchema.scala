package graft.sinks

import java.sql.Connection

/** Transactional DDL-recreate of the relational target schema — the
  * JDBC half of SURVEY OP-03 (the lake half is [[Publish]]'s
  * stage-and-swap). Mirrors the reference's schema builder semantics
  * (reference: src/Service/PostgresSchemaBuilder.php:45-122): drop the
  * whole schema, recreate it, create the four analytic tables in FK
  * dependency order plus their six query indexes, all inside ONE
  * transaction so a failure leaves the previous schema state intact.
  *
  * The DDL is exposed as an ordered statement list (unit-testable
  * without a database, like [[graft.sources.Formats.jdbcReadOptions]])
  * and executed over a plain `java.sql.Connection` — driver-side work
  * by nature (DDL is one round trip, not data movement), run before
  * [[graft.sources.Formats.writeJdbc]] loads each table.
  *
  * WARNING (as in the reference): `DROP SCHEMA ... CASCADE` destroys
  * all existing content — analytics/staging targets only.
  */
object JdbcSchema {

  /** Ordered DDL for the full recreate: schema reset, then tables in
    * FK dependency order (paciente → turno → prestacion →
    * prestacion_x_turno), each followed by its indexes. */
  def recreateStatements(schema: String = "public"): Seq[String] = Seq(
    s"DROP SCHEMA IF EXISTS $schema CASCADE",
    s"CREATE SCHEMA $schema",
    s"GRANT ALL ON SCHEMA $schema TO PUBLIC",
    """CREATE TABLE paciente (
      |    id SERIAL PRIMARY KEY,
      |    nombre VARCHAR(255) NOT NULL,
      |    apellido VARCHAR(255) NOT NULL,
      |    documento_identidad VARCHAR(255) NOT NULL,
      |    sexo_inferido VARCHAR(255)
      |)""".stripMargin,
    "CREATE INDEX idx_paciente_doc ON paciente (documento_identidad)",
    """CREATE TABLE turno (
      |    id SERIAL PRIMARY KEY,
      |    paciente_id INTEGER NOT NULL,
      |    fecha DATE NOT NULL,
      |    hora TIME(0) WITHOUT TIME ZONE NOT NULL,
      |    duracion_minutos INTEGER NOT NULL,
      |    sobreturno BOOLEAN NOT NULL,
      |    estado VARCHAR(255) NOT NULL,
      |    fecha_alta TIMESTAMP(0) WITHOUT TIME ZONE NOT NULL,
      |    usuario_alta VARCHAR(255) NOT NULL,
      |    CONSTRAINT fk_turno_paciente FOREIGN KEY (paciente_id)
      |        REFERENCES paciente (id) ON DELETE RESTRICT
      |)""".stripMargin,
    "CREATE INDEX idx_turno_paciente ON turno (paciente_id)",
    "CREATE INDEX idx_turno_fecha ON turno (fecha)",
    "CREATE INDEX idx_turno_estado ON turno (estado)",
    """CREATE TABLE prestacion (
      |    id SERIAL PRIMARY KEY,
      |    nombre VARCHAR(255) NOT NULL UNIQUE
      |)""".stripMargin,
    """CREATE TABLE prestacion_x_turno (
      |    id SERIAL PRIMARY KEY,
      |    turno_id INTEGER NOT NULL,
      |    prestacion_id INTEGER NOT NULL,
      |    CONSTRAINT fk_pxt_turno FOREIGN KEY (turno_id) REFERENCES turno (id) ON DELETE CASCADE,
      |    CONSTRAINT fk_pxt_prestacion FOREIGN KEY (prestacion_id) REFERENCES prestacion (id) ON DELETE RESTRICT
      |)""".stripMargin,
    "CREATE INDEX idx_pxt_turno ON prestacion_x_turno (turno_id)",
    "CREATE INDEX idx_pxt_prestacion ON prestacion_x_turno (prestacion_id)",
  )

  /** The same four target tables in Apache Derby dialect — for the
    * in-container wire test (no PostgreSQL ships in the image; Derby is
    * embedded on the Spark classpath). Differences from the reference
    * DDL are dialect-forced only: ids are plain BIGINTs (the engine
    * supplies dense ids — SERIAL is a Postgres default, not a schema
    * property), identifiers stay unquoted (Derby uppercases them; the
    * writer uppercases DataFrame columns to match), `hora` is a
    * VARCHAR (the pipeline emits HH:mm:ss strings), and there is no
    * schema-level DROP/GRANT (Derby has no CASCADE drop; tests use a
    * fresh in-memory database instead). */
  def derbyStatements(schema: String): Seq[String] = Seq(
    s"CREATE SCHEMA $schema",
    s"""CREATE TABLE $schema.paciente (
      |    id BIGINT NOT NULL PRIMARY KEY,
      |    nombre VARCHAR(255),
      |    apellido VARCHAR(255),
      |    documento VARCHAR(255) NOT NULL,
      |    sexo_inferido VARCHAR(255)
      |)""".stripMargin,
    s"CREATE INDEX idx_paciente_doc ON $schema.paciente (documento)",
    s"""CREATE TABLE $schema.turno (
      |    id BIGINT NOT NULL PRIMARY KEY,
      |    turno_natural_id BIGINT NOT NULL,
      |    paciente_id BIGINT NOT NULL,
      |    fecha DATE NOT NULL,
      |    hora VARCHAR(8) NOT NULL,
      |    duracion_minutos INTEGER NOT NULL,
      |    sobreturno BOOLEAN NOT NULL,
      |    estado VARCHAR(255) NOT NULL,
      |    fecha_alta TIMESTAMP NOT NULL,
      |    usuario_alta VARCHAR(255) NOT NULL,
      |    CONSTRAINT fk_turno_paciente FOREIGN KEY (paciente_id)
      |        REFERENCES $schema.paciente (id) ON DELETE RESTRICT
      |)""".stripMargin,
    s"CREATE INDEX idx_turno_paciente ON $schema.turno (paciente_id)",
    s"CREATE INDEX idx_turno_fecha ON $schema.turno (fecha)",
    s"CREATE INDEX idx_turno_estado ON $schema.turno (estado)",
    s"""CREATE TABLE $schema.prestacion (
      |    id BIGINT NOT NULL PRIMARY KEY,
      |    nombre VARCHAR(255) NOT NULL UNIQUE
      |)""".stripMargin,
    s"""CREATE TABLE $schema.prestacion_x_turno (
      |    id BIGINT NOT NULL PRIMARY KEY,
      |    turno_id BIGINT NOT NULL,
      |    prestacion_id BIGINT NOT NULL,
      |    CONSTRAINT fk_pxt_turno FOREIGN KEY (turno_id)
      |        REFERENCES $schema.turno (id) ON DELETE CASCADE,
      |    CONSTRAINT fk_pxt_prestacion FOREIGN KEY (prestacion_id)
      |        REFERENCES $schema.prestacion (id) ON DELETE RESTRICT
      |)""".stripMargin,
    s"CREATE INDEX idx_pxt_turno ON $schema.prestacion_x_turno (turno_id)",
    s"CREATE INDEX idx_pxt_prestacion ON $schema.prestacion_x_turno (prestacion_id)",
  )

  /** Execute an arbitrary DDL batch as one transaction: all statements
    * commit together or the whole batch rolls back (the OP-34
    * guarantee — a failed recreate leaves the previous target state
    * intact). Restores the connection's original autoCommit setting. */
  def recreate(conn: Connection, statements: Seq[String]): Unit = {
    val auto = conn.getAutoCommit
    conn.setAutoCommit(false)
    try {
      val st = conn.createStatement()
      try statements.foreach(st.execute)
      finally st.close()
      conn.commit()
    } catch {
      case t: Throwable =>
        conn.rollback()
        throw t
    } finally {
      conn.setAutoCommit(auto)
    }
  }

  /** [[recreate]] with the reference's PostgreSQL statement list. */
  def recreate(conn: Connection, schema: String = "public"): Unit =
    recreate(conn, recreateStatements(schema))
}
