// Dev tool: stage-by-stage wall-clock profile of the e2e Turnos job.
// Usage: sbt -batch "runMain graft.tools.ProfileJob <sfDir>"
package graft.tools

import org.apache.spark.sql.DataFrame

object ProfileJob {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val out = java.nio.file.Files.createTempDirectory("graft_prof_job").toFile
    val total0 = System.nanoTime()
    val wide = t("stage_wide")(graft.his.TurnosPipeline.wideExtract(spark, sfDir).localCheckpoint(true))
    t("isEmpty")(wide.isEmpty)
    val pac: DataFrame = t("stage_paciente")(graft.his.TurnosPipeline.paciente(wide).localCheckpoint(true))
    val turno = t("stage_turno")(graft.his.TurnosPipeline.turno(wide, pac).localCheckpoint(true))
    val long = t("stage_long")(graft.his.TurnosPipeline.prestacionLong(wide).localCheckpoint(true))
    val prest = t("stage_prestacion")(graft.his.TurnosPipeline.prestacion(long).localCheckpoint(true))
    val pxt = t("build_pxt")(graft.his.TurnosPipeline.prestacionXTurno(long, turno, prest))
    t("publish")(graft.sinks.Publish.publishTables(spark,
      Map("paciente" -> pac, "turno" -> turno, "prestacion" -> prest,
        "prestacion_x_turno" -> pxt),
      out.getAbsolutePath, "p", partitioning = Map("turno" -> Seq("fecha"))))
    t("counts")(Seq("paciente", "turno", "prestacion", "prestacion_x_turno")
      .foreach(n => graft.sinks.Publish.readTable(spark, out.getAbsolutePath, n).count()))
    println(f"PROF total ${(System.nanoTime() - total0) / 1e9}%.2f s")
    spark.stop()
  }
}
