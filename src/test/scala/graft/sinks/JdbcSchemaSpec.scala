package graft.sinks

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, Statement}
import org.scalatest.funsuite.AnyFunSuite

/** DDL-recreate (OP-03, relational half): statement-level checks plus a
  * reflective-proxy Connection proving the transaction envelope —
  * no database exists in this container, matching how
  * `jdbcReadOptions` is tested at the options level. */
class JdbcSchemaSpec extends AnyFunSuite {

  test("statement list: schema reset first, tables in FK order, 6 indexes") {
    val stmts = JdbcSchema.recreateStatements()
    assert(stmts.take(3).map(_.takeWhile(_ != ' ')) == Seq("DROP", "CREATE", "GRANT"))
    def idxOf(s: String): Int = stmts.indexWhere(_.contains(s))
    // FK dependency order: referenced tables created before referencing
    assert(idxOf("CREATE TABLE paciente") < idxOf("CREATE TABLE turno"))
    assert(idxOf("CREATE TABLE turno") < idxOf("CREATE TABLE prestacion_x_turno"))
    assert(idxOf("CREATE TABLE prestacion ") < idxOf("CREATE TABLE prestacion_x_turno"))
    assert(stmts.count(_.startsWith("CREATE TABLE")) == 4)
    assert(stmts.count(_.startsWith("CREATE INDEX")) == 6)
    // each index references an existing table created earlier
    stmts.filter(_.startsWith("CREATE INDEX")).foreach { ix =>
      val table = ix.split(" ON ")(1).takeWhile(_ != ' ')
      assert(idxOf(s"CREATE TABLE $table") >= 0 && idxOf(s"CREATE TABLE $table") < stmts.indexOf(ix),
        s"index before its table: $ix")
    }
    // custom schema name propagates to the reset statements, plus the
    // search_path SET that makes the unqualified DDL resolve there
    // (public needs no SET — the default search_path covers it, keeping
    // the reference form verbatim)
    val custom = JdbcSchema.recreateStatements("staging")
    assert(custom.head == "DROP SCHEMA IF EXISTS staging CASCADE")
    assert(custom(1) == "CREATE SCHEMA staging")
    assert(custom(3) == "SET search_path TO staging")
    assert(custom.size == stmts.size + 1)
    assert(!stmts.exists(_.startsWith("SET search_path")))
  }

  test("Postgres dialect DDL matches the reference's literal statements table-for-table") {
    def norm(s: String): String = s.replaceAll("\\s+", " ").trim.stripSuffix(";").stripSuffix(" ")
    // Expected statements transcribed verbatim from the reference's
    // schema builder (reference: src/Service/PostgresSchemaBuilder.php:
    // 52-113) — the exact DDL a user's real PostgreSQL target receives.
    val expected = Seq(
      "DROP SCHEMA IF EXISTS public CASCADE",
      "CREATE SCHEMA public",
      "GRANT ALL ON SCHEMA public TO PUBLIC",
      """CREATE TABLE paciente (
        |    id SERIAL PRIMARY KEY,
        |    nombre VARCHAR(255) NOT NULL,
        |    apellido VARCHAR(255) NOT NULL,
        |    documento_identidad VARCHAR(255) NOT NULL,
        |    sexo_inferido VARCHAR(255)
        |);""".stripMargin,
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
        |);""".stripMargin,
      "CREATE INDEX idx_turno_paciente ON turno (paciente_id)",
      "CREATE INDEX idx_turno_fecha ON turno (fecha)",
      "CREATE INDEX idx_turno_estado ON turno (estado)",
      """CREATE TABLE prestacion (
        |    id SERIAL PRIMARY KEY,
        |    nombre VARCHAR(255) NOT NULL UNIQUE
        |);""".stripMargin,
      """CREATE TABLE prestacion_x_turno (
        |    id SERIAL PRIMARY KEY,
        |    turno_id INTEGER NOT NULL,
        |    prestacion_id INTEGER NOT NULL,
        |    CONSTRAINT fk_pxt_turno FOREIGN KEY (turno_id) REFERENCES turno (id) ON DELETE CASCADE,
        |    CONSTRAINT fk_pxt_prestacion FOREIGN KEY (prestacion_id) REFERENCES prestacion (id) ON DELETE RESTRICT
        |);""".stripMargin,
      "CREATE INDEX idx_pxt_turno ON prestacion_x_turno (turno_id)",
      "CREATE INDEX idx_pxt_prestacion ON prestacion_x_turno (prestacion_id)")
    val got = JdbcSchema.recreateStatements()
    assert(got.size == expected.size)
    got.zip(expected).foreach { case (g, e) =>
      assert(norm(g) == norm(e), s"dialect drift:\n got: $g\nwant: $e")
    }
  }

  test("Derby dialect renders the same model with Derby types, qualified names") {
    val stmts = JdbcSchema.Derby.ddl("stg", JdbcSchema.referenceTables)
    assert(stmts.head == "CREATE SCHEMA stg")
    assert(!stmts.exists(_.contains("SERIAL")), "Derby has no SERIAL")
    assert(!stmts.exists(_.contains("WITHOUT TIME ZONE")))
    val turno = stmts.find(_.startsWith("CREATE TABLE stg.turno")).get
    assert(turno.contains("id BIGINT NOT NULL PRIMARY KEY"))
    assert(turno.contains("hora TIME NOT NULL"))
    assert(turno.contains("fecha_alta TIMESTAMP NOT NULL"))
    assert(turno.contains("REFERENCES stg.paciente (id) ON DELETE RESTRICT"))
    // same column model in both dialects: names line up 1:1
    def colNames(ddl: Seq[String], t: String) = ddl.find(_.contains(s"TABLE $t") ).get
      .linesIterator.drop(1).map(_.trim.takeWhile(_ != ' ')).filter(_.nonEmpty)
      .filterNot(Set("CONSTRAINT", ")")).toSeq
    JdbcSchema.referenceTables.map(_.name).foreach { t =>
      assert(colNames(stmts.map(s => s.replace(s"stg.$t", t)), t) ==
        colNames(JdbcSchema.recreateStatements(), t), s"column drift in $t")
    }
  }

  /** Proxy-backed fake Connection recording executed SQL and
    * transaction calls; `failOn` makes that statement throw. */
  private class FakeDb(failOn: Option[String] = None) {
    val log = scala.collection.mutable.ArrayBuffer[String]()
    private var autoCommit = true

    private val stmtHandler: InvocationHandler = (_, m: Method, args: Array[AnyRef]) =>
      m.getName match {
        case "execute" =>
          val sql = args(0).asInstanceOf[String]
          if (failOn.exists(sql.contains)) throw new java.sql.SQLException(s"boom: $sql")
          log += s"execute:${sql.takeWhile(_ != ' ')}:${sql.split("\\s+").take(3).mkString(" ")}"
          java.lang.Boolean.FALSE
        case "close" => log += "stmt-close"; null
        case _ => null
      }

    private val stmt = Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[Statement]), stmtHandler).asInstanceOf[Statement]

    private val connHandler: InvocationHandler = (_, m: Method, args: Array[AnyRef]) =>
      m.getName match {
        case "createStatement" => log += "createStatement"; stmt
        case "commit" => log += "commit"; null
        case "rollback" => log += "rollback"; null
        case "getAutoCommit" => java.lang.Boolean.valueOf(autoCommit)
        case "setAutoCommit" =>
          autoCommit = args(0).asInstanceOf[java.lang.Boolean]
          log += s"autoCommit=$autoCommit"; null
        case _ => null
      }

    val conn: Connection = Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[Connection]), connHandler).asInstanceOf[Connection]
  }

  test("recreate executes every statement in order inside one transaction") {
    val db = new FakeDb()
    JdbcSchema.recreate(db.conn)
    val executes = db.log.filter(_.startsWith("execute:"))
    assert(executes.size == JdbcSchema.recreateStatements().size)
    assert(executes.head.contains("DROP SCHEMA"))
    assert(db.log.head == "autoCommit=false")
    assert(db.log.count(_ == "commit") == 1)
    assert(!db.log.contains("rollback"))
    // commit after all executes; autoCommit restored last
    assert(db.log.indexOf("commit") > db.log.lastIndexOf(executes.last))
    assert(db.log.last == "autoCommit=true")
  }

  test("a failing statement rolls back, propagates, and never commits") {
    val db = new FakeDb(failOn = Some("CREATE TABLE prestacion_x_turno"))
    val e = intercept[java.sql.SQLException] { JdbcSchema.recreate(db.conn) }
    assert(e.getMessage.contains("boom"))
    assert(db.log.contains("rollback"))
    assert(!db.log.contains("commit"))
    assert(db.log.last == "autoCommit=true", "autoCommit restored even on failure")
  }
}
