// Dev tool: fine-grained wall-clock profile of the stored-ANN index
// lifecycle (ann03b/c/d family — build/append/compact/stats/query).
// Usage: sbt -batch "runMain graft.tools.ProfileAnn <sfDir>"
package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Similarity

object ProfileAnn {
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
    val emb = graft.Tables.embeddings(spark, sfDir)
    val live = java.nio.file.Files.createTempDirectory("prof_ann_live").toFile.getAbsolutePath
    val compacted = java.nio.file.Files.createTempDirectory("prof_ann_comp").toFile.getAbsolutePath
    val total0 = System.nanoTime()
    t("build_1000")(Similarity.writeBucketedCorpus(emb.filter(col("vec_id") < 1000), live))
    t("append_500")(Similarity.appendToStoredBuckets(
      emb.filter(col("vec_id") >= 1000 && col("vec_id") < 1500), live))
    t("append_rest")(Similarity.appendToStoredBuckets(emb.filter(col("vec_id") >= 1500), live))
    t("compact")(Similarity.compactStoredBuckets(spark, live, compacted))
    t("query")(Similarity.bucketedTopKStored(spark, compacted, emb.filter(col("vec_id") < 50), 10)
      .write.format("noop").mode("overwrite").save())
    t("stats_verified")(Similarity.bucketStatsVerified(spark, compacted).collect())
    println(f"PROF total ${(System.nanoTime() - total0) / 1e9}%.2f s")
    spark.stop()
  }
}
