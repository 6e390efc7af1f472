package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def probe = (1L to 5000L).toDF("k").repartition(5)
  private def build = (1L to 5000L).filter(_ % 37 == 0).toDF("bk")

  test("bloomSemiJoin equals the plain semi-join (false positives removed)") {
    val got = RuntimeFilter.bloomSemiJoin(probe, build, "k", "bk")
      .as[Long].collect().sorted.toSeq
    val want = probe.join(build.select($"bk".as("k")), Seq("k"), "left_semi")
      .as[Long].collect().sorted.toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("the bloom has no false negatives: every build key passes the test") {
    val set = RuntimeFilter.bloomBits(build, col("bk"), 3, 8192)
    val pass = build.filter(RuntimeFilter.mightContain(col("bk"), set, 3)).count()
    assert(pass == build.count())
  }

  test("a selective build prunes most probe rows before the join") {
    val set = RuntimeFilter.bloomBits(build, col("bk"), 3, 8192)
    val kept = probe.filter(RuntimeFilter.mightContain(col("k"), set, 3)).count()
    // 135 true keys; 8192 bits / 3 hashes → false-positive rate well
    // under 1%, so the prefilter must drop the overwhelming majority.
    assert(kept < 400, s"bloom kept $kept of 5000 probe rows")
    assert(kept >= build.count())
  }

  test("the membership test is a scan-side filter, not a join") {
    val set = RuntimeFilter.bloomBits(build, col("bk"), 3, 8192)
    val df = probe.filter(RuntimeFilter.mightContain(col("k"), set, 3))
    val plan = df.queryExecution.executedPlan
    val joins = plan.collect {
      case j if j.nodeName.toLowerCase.contains("join") => j
    }
    assert(joins.isEmpty, "bit test must not introduce a join")
    val exchanges = plan.collect {
      case e if e.nodeName.toLowerCase.contains("exchange") => e
    }
    assert(exchanges.isEmpty, "bit test must not introduce a shuffle")
  }
}
