package graft.his

import graft.functions.Gender

/** DuckDB-runnable ANSI SQL equivalents of [[TurnosPipeline]], generated
  * from the same constants so Spark and oracle can never drift on the
  * synthetic-messiness rules.
  *
  * DuckDB/Spark parity rules baked in here:
  *  - string concat uses `||` (NULL-propagating, like Spark `concat`);
  *    DuckDB's `concat()` function IGNORES nulls and must not be used.
  *  - `regexp_replace(..., 'g')` — DuckDB replaces first match only
  *    without the flag; Spark is global by default.
  *  - integer division is `//`; row_number is cast to BIGINT to match
  *    Spark's long-cast ids.
  *  - the shared CTEs (`slots`/`wide`/`paciente`/`prest_long`/
  *    `prestacion`) are MATERIALIZED: DuckDB inlines plain CTEs per
  *    reference, and op13's 12 references to `wide` re-evaluated the
  *    6M-row ranked window 12× at the ~sf1 stamp replica (79 GB of
  *    spill before dying). Hash-neutral — evaluate-once only.
  */
object TurnosOracle {
  private val n = TurnosPipeline.nSlots

  private def givenNameSql(custkey: String): String = {
    val whens = TurnosPipeline.givenNames.zipWithIndex
      .map { case (name, i) => s"WHEN $i THEN '$name'" }.mkString(" ")
    s"(CASE ($custkey % ${TurnosPipeline.givenNames.size}) $whens END)"
  }

  // collapse-then-trim, mirroring Cleaning.limpiarNombres (SQL trim only
  // strips spaces; collapsing first normalizes tabs/newlines at the edges)
  private def limpiar(expr: String): String =
    s"upper(trim(regexp_replace($expr, '\\s+', ' ', 'g')))"

  /** Shared WITH-clause prologue: ranked lineitems → slots → wide. */
  val wideCte: String = {
    val slotCols = (0 until n)
      .map(k => s"max(CASE WHEN rn = ${k + 1} THEN pad END) AS prestacion$k")
      .mkString(", ")
    val sec = "((o.o_orderkey * 7919) % 86400)"
    val hora = s"lpad(CAST(($sec // 3600) AS VARCHAR), 2, '0') || ':' || " +
      s"lpad(CAST((($sec % 3600) // 60) AS VARCHAR), 2, '0') || ':' || " +
      s"lpad(CAST(($sec % 60) AS VARCHAR), 2, '0')"
    s"""ranked AS (
  SELECT l_orderkey AS rk_orderkey, p_name,
         row_number() OVER (PARTITION BY l_orderkey
           ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice) AS rn
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
slots AS MATERIALIZED (
  SELECT rk_orderkey, $slotCols
  FROM (SELECT rk_orderkey, rn,
               CASE WHEN rn % 2 = 1 THEN ' ' || p_name || '  ' ELSE p_name END AS pad
        FROM ranked WHERE rn <= $n) t
  GROUP BY rk_orderkey
),
wide AS MATERIALIZED (
  SELECT o.o_orderkey AS turno_id,
         o.o_orderpriority AS turno_tipo,
         c.c_name AS paciente_documento,
         CASE WHEN c.c_custkey % 37 = 0 THEN NULL
              ELSE '  ' || ${givenNameSql("c.c_custkey")} || '  ' || lower(c.c_mktsegment) || ' '
         END AS paciente_nombre_raw,
         CASE WHEN c.c_custkey % 41 = 0 THEN NULL
              ELSE n.n_name || '   ' || r.r_name
         END AS paciente_apellido_raw,
         CAST(o.o_orderdate AS DATE) AS fecha,
         $hora AS hora,
         CAST(((o.o_orderkey % 12) + 1) * 5 AS INTEGER) AS duracion_minutos,
         (o.o_orderkey % 10 = 0) AS sobreturno,
         o.o_orderstatus AS estado,
         o.o_orderdate AS fecha_alta,
         'user' || CAST(o.o_orderkey % 7 AS VARCHAR) AS usuario_alta,
         ${(0 until n).map(k => s"s.prestacion$k").mkString(", ")}
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  LEFT JOIN slots s ON o.o_orderkey = s.rk_orderkey
)"""
  }

  private val pacienteCte: String =
    s"""pac_ranked AS (
  SELECT paciente_documento AS documento,
         ${limpiar("paciente_nombre_raw")} AS nombre,
         ${limpiar("paciente_apellido_raw")} AS apellido,
         row_number() OVER (PARTITION BY paciente_documento
           ORDER BY fecha_alta DESC, turno_id ASC) AS prn
  FROM wide
),
paciente AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY documento) AS BIGINT) AS id,
         nombre, apellido, documento,
         ${Gender.oracleCase("split_part(nombre, ' ', 1)")} AS sexo_inferido
  FROM pac_ranked WHERE prn = 1
)"""

  private val turnoCte: String =
    """turno AS (
  SELECT CAST(row_number() OVER (ORDER BY w.fecha_alta DESC, w.turno_id ASC) AS BIGINT) AS id,
         w.turno_id AS turno_natural_id, p.id AS paciente_id,
         w.fecha, w.hora, w.duracion_minutos, w.sobreturno, w.estado,
         w.fecha_alta, w.usuario_alta
  FROM wide w JOIN paciente p ON w.paciente_documento = p.documento
)"""

  private val longCte: String = {
    val branches = (0 until n)
      .map(k => s"SELECT turno_id, $k AS slot, prestacion$k AS nombre FROM wide")
      .mkString("\n    UNION ALL ")
    s"""prest_long AS MATERIALIZED (
  SELECT turno_id AS turno_natural_id, slot, trim(nombre) AS nombre FROM (
    $branches
  ) u WHERE nombre IS NOT NULL AND trim(nombre) <> ''
)"""
  }

  private val prestacionCte: String =
    """prestacion AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY nombre) AS BIGINT) AS id, nombre
  FROM (SELECT DISTINCT nombre FROM prest_long) d
)"""

  private val pxtCte: String =
    """pxt AS (
  SELECT CAST(row_number() OVER (ORDER BY t.id, pr.id, l.slot) AS BIGINT) AS id,
         t.id AS turno_id, pr.id AS prestacion_id
  FROM prest_long l
  JOIN turno t ON l.turno_natural_id = t.turno_natural_id
  JOIN prestacion pr ON l.nombre = pr.nombre
)"""

  val wideSql: String = s"WITH $wideCte SELECT * FROM wide"

  /** OP-20: the unpivot stage alone (long-form prestaciones). */
  val unpivotSql: String = s"WITH $wideCte,\n$longCte SELECT * FROM prest_long"

  /** OP-13: the reference's repeated-dimension join — prestacion catalog
    * LEFT-joined once per denormalized slot column. */
  val repeatedDimJoinSql: String = {
    val joins = (0 until n)
      .map(k => s"LEFT JOIN prestacion p$k ON trim(w.prestacion$k) = p$k.nombre")
      .mkString("\n")
    val outs = (0 until n).map(k => s"p$k.id AS p$k").mkString(", ")
    s"""WITH $wideCte,
$longCte,
$prestacionCte
SELECT w.turno_id, $outs
FROM wide w
$joins"""
  }
  val pacienteSql: String = s"WITH $wideCte,\n$pacienteCte SELECT * FROM paciente"
  val turnoSql: String =
    s"WITH $wideCte,\n$pacienteCte,\n$turnoCte SELECT * FROM turno"
  val prestacionSql: String =
    s"WITH $wideCte,\n$longCte,\n$prestacionCte SELECT * FROM prestacion"
  val pxtSql: String =
    s"WITH $wideCte,\n$pacienteCte,\n$turnoCte,\n$longCte,\n$prestacionCte,\n$pxtCte SELECT * FROM pxt"
}
