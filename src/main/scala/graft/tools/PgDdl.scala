package graft.tools

/** Dev tool (not part of the library): print the reference-dialect
  * PostgreSQL recreate statement list
  * ([[graft.sinks.JdbcSchema.recreateStatements]]) terminated for psql —
  * lets a `psql --single-transaction` session drive a REAL PostgreSQL
  * server in environments that ship the server but no JDBC driver jar
  * (zero-egress sandboxes). The statement LIST is the same object
  * `JdbcSchema.recreate` executes over JDBC, so a psql transcript
  * exercises the identical DDL the one-transaction recreate sends on
  * the wire. Optional second arg `--drop-last` emits all but the final
  * statement (the atomic-rollback probe builds on it).
  */
object PgDdl {
  def main(args: Array[String]): Unit = {
    val schema = args.headOption.getOrElse("graft_wire_test")
    val stmts = graft.sinks.JdbcSchema.recreateStatements(schema)
    val out = if (args.contains("--drop-last")) stmts.dropRight(1) else stmts
    out.foreach(s => println(s.trim + ";"))
  }
}
