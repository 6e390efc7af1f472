// Dev tool (round 16): isolate the stages of the fused IVF/PQ chains.
// Usage: sbt -batch "runMain graft.tools.ProfileIvf <sfDir>"
package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Similarity

object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    def t[A](label: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val emb = graft.Tables.embeddings(spark, sfDir)
    t("count")(println("rows " + emb.count()))
    t("scan_noop")(noop(emb))
    val cents = t("kmeans_16x2")(Similarity.kmeansCentroids(emb, 16, 2))
    val cents0 = t("kmeans_16x0")(Similarity.kmeansCentroids(emb, 16, 0))
    t("assign_n1")(noop(Similarity.ivfAssign(
      graft.operators.NearDup.fanOut(emb.select(col("vec_id"), col("embedding"))), cents)))
    t("assign_n1_unfanned")(noop(Similarity.ivfAssign(
      emb.select(col("vec_id"), col("embedding")), cents)))
    t("ann04_full")(noop(Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 30), 10)))
    val cb = t("pq_codebook_trained_16x64x2")(
      Similarity.pqCodebookTrained(emb, 16, 4, 64, 2))
    t("pq_encode_via_topk")(noop(
      Similarity.pqTopKTrained(emb, emb.filter(col("vec_id") < 10), 10,
        cbOpt = Some(cb))))
    spark.stop()
  }
}
