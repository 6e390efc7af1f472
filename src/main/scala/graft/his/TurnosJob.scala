package graft.his

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sinks.Publish

/** The reference command's `execute()` analog (reference:
  * src/Command/EtlHisTurnosCommand.php:75-224): extract → transform →
  * all-or-nothing publish of the 4 normalized tables.
  *
  * The reference's pipeline-level invariants, mapped:
  *  - OP-31 all-or-nothing transaction  → [[Publish.publishTables]]
  *    stage-and-swap (readers see old or new version, never a mix; a
  *    failed publish leaves the old version current).
  *  - OP-33 empty-input short-circuit   → zero extracted rows returns
  *    WITHOUT touching the published target.
  *  - OP-34 load-failure detection      → any task failure aborts the
  *    staging write; the manifest never flips.
  */
object TurnosJob {

  /** Outcome: the published version (None when short-circuited) and
    * per-table row counts. */
  case class Result(published: Option[String], counts: Map[String, Long])

  def run(spark: SparkSession, sfDir: String, outRoot: String,
          version: String): Result =
    runFromWide(spark, TurnosPipeline.wideExtract(spark, sfDir), outRoot, version)

  /** Same, from an already-built wide extract (testing seam). */
  def runFromWide(spark: SparkSession, wide: DataFrame, outRoot: String,
                  version: String): Result = {
    // OP-33: never destroy the target on an empty/failed extract.
    if (wide.isEmpty) return Result(None, Map.empty)

    val pac = TurnosPipeline.paciente(wide)
    val turnoDim = TurnosPipeline.turno(wide, pac)
    val long = TurnosPipeline.prestacionLong(wide)
    val prest = TurnosPipeline.prestacion(long)
    val pxt = TurnosPipeline.prestacionXTurno(long, turnoDim, prest)

    val tables = Map(
      "paciente" -> pac,
      "turno" -> turnoDim,
      "prestacion" -> prest,
      "prestacion_x_turno" -> pxt)
    // The fact table publishes partitioned by appointment date — at
    // 100 TB readers prune whole date directories (PublishSpec proves
    // the pruning); the dims and the id-keyed pivot table stay flat.
    Publish.publishTables(spark, tables, outRoot, version,
      partitioning = Map("turno" -> Seq("fecha")))

    Result(Some(s"v-$version"),
      tables.keys.map(t => t -> Publish.readTable(spark, outRoot, t).count()).toMap)
  }
}
