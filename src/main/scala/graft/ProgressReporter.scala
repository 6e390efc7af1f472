package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Progress reporting (SURVEY OP-35): the reference prints per-phase
  * row counts and status lines to its console as the ETL advances
  * (reference: src/Command/EtlHisTurnosCommand.php:118,203,209). A
  * driver-side loop can't see distributed progress, so the Spark-native
  * analog is a `SparkListener`: job/stage lifecycle events carrying
  * task counts and record metrics, pushed to a pluggable sink (default
  * stderr — swap in a metrics client or progress bar in production).
  *
  * Listener callbacks run on the listener-bus thread and MUST be cheap
  * (a slow listener drops events); this one only formats and forwards.
  */
class ProgressReporter(report: String => Unit = s => System.err.println(s))
    extends SparkListener {

  /** Total records read (input + shuffle) across completed stages. */
  val recordsSeen = new AtomicLong(0L)

  override def onJobStart(j: SparkListenerJobStart): Unit =
    report(s"[progress] job ${j.jobId} started (${j.stageInfos.size} stages)")

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val m = si.taskMetrics
    val recs = m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead
    recordsSeen.addAndGet(recs)
    val name = si.name.takeWhile(_ != '\n')
    report(s"[progress] stage ${si.stageId} '$name': ${si.numTasks} tasks, " +
      s"$recs records, ${m.executorRunTime} ms executor time")
  }

  override def onJobEnd(j: SparkListenerJobEnd): Unit =
    report(s"[progress] job ${j.jobId} finished: ${j.jobResult}")
}

object ProgressReporter {
  /** Attach a reporter to the session's listener bus and return it
    * (detach with `spark.sparkContext.removeSparkListener`). */
  def attach(spark: SparkSession,
             report: String => Unit = s => System.err.println(s)): ProgressReporter = {
    val l = new ProgressReporter(report)
    spark.sparkContext.addSparkListener(l)
    l
  }
}
