// Dev tool: stage-by-stage wall-clock profile of the dd10 canonicalize
// pipeline. Usage: sbt -batch "runMain graft.tools.ProfileDedup <sfDir>"
package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object ProfileDedup {
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
    import graft.operators.NearDup
    import graft.functions.TextAnalysis

    // mirror dd10's call: quality gate then canonicalize
    val docs0 = graft.Tables.documents(spark, sfDir)
    val total0 = System.nanoTime()
    val docs = t("quality_gate") {
      val d = docs0.filter(length(col("text")) >= 10).select(col("doc_id"), col("text"))
      d.localCheckpoint(true)
    }
    val mapping = t("exact_mapping") {
      docs.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("__fp"))
        .select(col("doc_id"),
          min(col("doc_id")).over(Window.partitionBy(col("__fp"))).as("__exact"))
        .localCheckpoint(true)
    }
    val reps = t("reps_semijoin") {
      docs.join(mapping.filter(col("doc_id") === col("__exact")).select(col("doc_id")),
        Seq("doc_id"), "left_semi").localCheckpoint(true)
    }
    val pairs = t("minhash_candidates") {
      NearDup.minhashCandidates(reps, "doc_id", "text", 16, 3, 2).localCheckpoint(true)
    }
    val jac = t("jaccard") {
      NearDup.jaccardOnPairs(reps, pairs, "doc_id", "text", 3).localCheckpoint(true)
    }
    val cc = t("components") {
      NearDup.neardupComponents(reps, jac, "doc_id", 0.5).localCheckpoint(true)
    }
    t("final_join") {
      mapping.join(cc.select(col("doc_id").as("__exact"), col("canonical_id")), Seq("__exact"))
        .select(col("doc_id"), col("canonical_id"))
        .write.format("noop").mode("overwrite").save()
    }
    println(f"PROF total ${(System.nanoTime() - total0) / 1e9}%.2f s")
    spark.stop()
  }
}
