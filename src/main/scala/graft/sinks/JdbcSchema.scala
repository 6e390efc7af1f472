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

  /** Dialect-neutral column types of the analytic target schema. */
  sealed trait SqlType
  case object IdType extends SqlType        // surrogate key
  case object FkType extends SqlType        // FK integer
  case object StrType extends SqlType       // bounded string
  case object DateType extends SqlType
  case object TimeType extends SqlType      // time-of-day, second precision
  case object TimestampType extends SqlType // wall-clock, second precision
  case object BoolType extends SqlType
  case object IntType extends SqlType

  case class ColDef(name: String, tpe: SqlType, notNull: Boolean = false,
                    unique: Boolean = false)
  case class FkDef(name: String, column: String, refTable: String, onDelete: String)
  case class IndexDef(name: String, column: String)
  case class TableDef(name: String, cols: Seq[ColDef], fks: Seq[FkDef] = Nil,
                      indexes: Seq[IndexDef] = Nil)

  /** Per-database DDL dialect: the TYPE MAPPING is the part that breaks
    * on day one when pointing a generic writer at a real database —
    * PostgreSQL's analytic target needs SERIAL / TIME(0) / TIMESTAMP(0)
    * (the reference's exact types,
    * reference: src/Service/PostgresSchemaBuilder.php:60-113) while
    * embedded Derby has no SERIAL and second-precision is spelled
    * plainly. Both dialects render the SAME neutral [[TableDef]] model,
    * so the two DDLs cannot drift column-wise. */
  sealed trait SqlDialect {
    def typeName(t: SqlType): String
    /** Full DDL fragment for the surrogate-id column (dialects disagree
      * about both type and default generation). */
    def idDdl: String
    def prelude(schema: String): Seq[String]
    def qualify(schema: String, table: String): String

    def createTable(schema: String, t: TableDef): String = {
      val colLines = t.cols.map { c =>
        val base =
          if (c.tpe == IdType) s"${c.name} $idDdl"
          else s"${c.name} ${typeName(c.tpe)}" +
            (if (c.notNull) " NOT NULL" else "") +
            (if (c.unique) " UNIQUE" else "")
        base
      }
      val fkLines = t.fks.map(fk =>
        s"CONSTRAINT ${fk.name} FOREIGN KEY (${fk.column}) " +
          s"REFERENCES ${qualify(schema, fk.refTable)} (id) ON DELETE ${fk.onDelete}")
      s"CREATE TABLE ${qualify(schema, t.name)} (\n" +
        (colLines ++ fkLines).map("    " + _).mkString(",\n") + "\n)"
    }

    /** Ordered DDL for the full recreate: schema reset, then tables in
      * the given (FK dependency) order, each followed by its indexes. */
    def ddl(schema: String, tables: Seq[TableDef]): Seq[String] =
      prelude(schema) ++ tables.flatMap { t =>
        createTable(schema, t) +: t.indexes.map(ix =>
          s"CREATE INDEX ${ix.name} ON ${qualify(schema, t.name)} (${ix.column})")
      }
  }

  /** The reference's target dialect (PostgresSchemaBuilder.php:60-113):
    * SERIAL keys, second-precision TIME(0)/TIMESTAMP(0) WITHOUT TIME
    * ZONE, unqualified table names (search_path resolves them inside
    * the recreated schema). */
  case object Postgres extends SqlDialect {
    def typeName(t: SqlType): String = t match {
      case StrType => "VARCHAR(255)"
      case DateType => "DATE"
      case TimeType => "TIME(0) WITHOUT TIME ZONE"
      case TimestampType => "TIMESTAMP(0) WITHOUT TIME ZONE"
      case BoolType => "BOOLEAN"
      case IntType | FkType => "INTEGER"
      case IdType => "SERIAL"
    }
    def idDdl: String = "SERIAL PRIMARY KEY"
    // The reference recreates `public` (PostgresSchemaBuilder.php:51-54),
    // where the DEFAULT search_path already resolves its unqualified
    // CREATE TABLEs — so the public form stays statement-for-statement
    // verbatim (JdbcSchemaSpec pins it). A CUSTOM schema needs the
    // search_path pointed at it or the unqualified tables silently land
    // in public (found the day a real server ran the custom-schema
    // path); SET is transactional, so the one-txn recreate's rollback
    // also rolls the path back.
    def prelude(schema: String): Seq[String] = {
      val reset = Seq(
        s"DROP SCHEMA IF EXISTS $schema CASCADE",
        s"CREATE SCHEMA $schema",
        s"GRANT ALL ON SCHEMA $schema TO PUBLIC")
      if (schema == "public") reset
      else reset :+ s"SET search_path TO $schema"
    }
    def qualify(schema: String, table: String): String = table
  }

  /** Embedded-Derby dialect (the wire-test database): no SERIAL — the
    * engine supplies dense ids, so the key is a plain BIGINT — no
    * CASCADE schema drop or GRANT, qualified table names, and plain
    * TIME/TIMESTAMP (Derby's only precision). */
  case object Derby extends SqlDialect {
    def typeName(t: SqlType): String = t match {
      case StrType => "VARCHAR(255)"
      case DateType => "DATE"
      case TimeType => "TIME"
      case TimestampType => "TIMESTAMP"
      case BoolType => "BOOLEAN"
      case IntType => "INTEGER"
      case FkType => "BIGINT"
      case IdType => "BIGINT"
    }
    def idDdl: String = "BIGINT NOT NULL PRIMARY KEY"
    def prelude(schema: String): Seq[String] = Seq(s"CREATE SCHEMA $schema")
    def qualify(schema: String, table: String): String = s"$schema.$table"
  }

  /** The reference's four analytic tables in FK dependency order
    * (paciente → turno → prestacion → prestacion_x_turno), column for
    * column (PostgresSchemaBuilder.php:60-113). */
  val referenceTables: Seq[TableDef] = Seq(
    TableDef("paciente",
      cols = Seq(
        ColDef("id", IdType),
        ColDef("nombre", StrType, notNull = true),
        ColDef("apellido", StrType, notNull = true),
        ColDef("documento_identidad", StrType, notNull = true),
        ColDef("sexo_inferido", StrType)),
      indexes = Seq(IndexDef("idx_paciente_doc", "documento_identidad"))),
    TableDef("turno",
      cols = Seq(
        ColDef("id", IdType),
        ColDef("paciente_id", FkType, notNull = true),
        ColDef("fecha", DateType, notNull = true),
        ColDef("hora", TimeType, notNull = true),
        ColDef("duracion_minutos", IntType, notNull = true),
        ColDef("sobreturno", BoolType, notNull = true),
        ColDef("estado", StrType, notNull = true),
        ColDef("fecha_alta", TimestampType, notNull = true),
        ColDef("usuario_alta", StrType, notNull = true)),
      fks = Seq(FkDef("fk_turno_paciente", "paciente_id", "paciente", "RESTRICT")),
      indexes = Seq(
        IndexDef("idx_turno_paciente", "paciente_id"),
        IndexDef("idx_turno_fecha", "fecha"),
        IndexDef("idx_turno_estado", "estado"))),
    TableDef("prestacion",
      cols = Seq(
        ColDef("id", IdType),
        ColDef("nombre", StrType, notNull = true, unique = true))),
    TableDef("prestacion_x_turno",
      cols = Seq(
        ColDef("id", IdType),
        ColDef("turno_id", FkType, notNull = true),
        ColDef("prestacion_id", FkType, notNull = true)),
      fks = Seq(
        FkDef("fk_pxt_turno", "turno_id", "turno", "CASCADE"),
        FkDef("fk_pxt_prestacion", "prestacion_id", "prestacion", "RESTRICT")),
      indexes = Seq(
        IndexDef("idx_pxt_turno", "turno_id"),
        IndexDef("idx_pxt_prestacion", "prestacion_id"))))

  /** Ordered DDL for the full recreate in the reference's PostgreSQL
    * dialect — generated from [[referenceTables]];
    * JdbcSchemaSpec pins it statement-for-statement to the reference's
    * literal DDL. */
  def recreateStatements(schema: String = "public"): Seq[String] =
    Postgres.ddl(schema, referenceTables)

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
