package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness: runs every registered query against
  * `SPARK_GRAFT_SF_DIR` with a noop sink and prints ONE JSON line.
  *
  * Variance hardening (this box showed 4× run-to-run swings on identical
  * code, and a cold JVM charges ~10 s of JIT/codegen to whichever query
  * runs first):
  *  - a warm-up phase exercises the parquet-scan/join/agg codegen paths
  *    before any timing starts;
  *  - queries whose first timed run is cheap (< [[Bench.MedianUnder]] s)
  *    run three times and report the MEDIAN — one GC/JIT hiccup no
  *    longer turns a 0.3 s scan into a 25 s "regression";
  *  - expensive queries keep single-shot timing (already above noise,
  *    and tripling them would triple the bench wall-clock).
  *
  * Failures are NOT swallowed into fast timings: a query whose write
  * throws reports value -1.0 and its error class under "errors".
  */
object Bench {

  /** First-run threshold (sec) under which a query is re-run for a
    * median-of-3; above it, single-shot. */
  val MedianUnder = 15.0

  private def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                      spark: SparkSession, sfDir: String): (Double, Option[String]) = {
    val t0 = System.nanoTime()
    try {
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      ((System.nanoTime() - t0) / 1e9, None)
    } catch {
      case t: Throwable => ((System.nanoTime() - t0) / 1e9, Some(t.getClass.getSimpleName))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: flagship query twice (JIT + codegen cache + shuffle
    // machinery), untimed.
    (1 to 2).foreach { _ =>
      try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      // noop sink, not count(): count() lets Catalyst prune away the
      // projections being measured; noop computes every output row.
      val (t1, e1) = runOnce(fn, spark, sfDir)
      val value = e1 match {
        case Some(err) => errors(name) = err; -1.0
        case None if t1 < MedianUnder =>
          val more = Seq.fill(2)(runOnce(fn, spark, sfDir))
          more.collectFirst { case (_, Some(err)) => err } match {
            case Some(err) => errors(name) = err; -1.0
            case None => (t1 +: more.map(_._1)).sorted.apply(1) // median of 3
          }
        case None => t1
      }
      name -> value
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val ok = results.values.filter(_ >= 0)
    val total = if (ok.nonEmpty) ok.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}""")
    spark.stop()
  }
}
