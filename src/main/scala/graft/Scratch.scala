package graft

import org.apache.spark.sql.functions._
import graft.operators.NearDup
import graft.Tables

/** Dev-only profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    docs.count()
    time("dd02 signature")(
      NearDup.minhashSignature(docs, "doc_id", "text", 16, 3)
        .write.format("noop").mode("overwrite").save())
    time("dd03 candidates")(
      NearDup.minhashCandidates(docs, "doc_id", "text", 16, 3, 2)
        .write.format("noop").mode("overwrite").save())
    time("dd04 jaccard")(
      NearDup.jaccardOnPairs(docs,
        NearDup.minhashCandidates(docs, "doc_id", "text", 16, 3, 2),
        "doc_id", "text", 3)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
