package graft.queries

import graft.his.{TurnosOracle, TurnosPipeline}

/** The full reference pipeline, staged as oracle-checked queries:
  * wide extract (OP-05..13, OP-18) → paciente (OP-15/19/26/29) →
  * turno (OP-19/21) → prestacion (OP-16/20) → prestacion_x_turno
  * (OP-19/20/21). Together these cover the reference's entire
  * transform/load surface end-to-end. */
object HisQueries {
  val all: Seq[Q] = Seq(
    Q("his_extract_wide",
      (s, d) => TurnosPipeline.wideExtract(s, d),
      Some(TurnosOracle.wideSql)),
    Q("his_paciente",
      (s, d) => TurnosPipeline.paciente(TurnosPipeline.wideExtract(s, d)),
      Some(TurnosOracle.pacienteSql)),
    Q("his_turno",
      (s, d) => {
        val wide = TurnosPipeline.wideExtract(s, d)
        TurnosPipeline.turno(wide, TurnosPipeline.paciente(wide))
      },
      Some(TurnosOracle.turnoSql)),
    Q("his_prestacion",
      (s, d) => TurnosPipeline.prestacion(
        TurnosPipeline.prestacionLong(TurnosPipeline.wideExtract(s, d))),
      Some(TurnosOracle.prestacionSql)),
    Q("his_prestacion_x_turno",
      (s, d) => {
        val wide = TurnosPipeline.wideExtract(s, d)
        val long = TurnosPipeline.prestacionLong(wide)
        val turnoDim = TurnosPipeline.turno(wide, TurnosPipeline.paciente(wide))
        TurnosPipeline.prestacionXTurno(long, turnoDim, TurnosPipeline.prestacion(long))
      },
      Some(TurnosOracle.pxtSql)),
  )
}
