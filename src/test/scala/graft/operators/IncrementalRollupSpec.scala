package graft.operators

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

class IncrementalRollupSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("g")

  private def facts(rows: (String, Double)*): DataFrame =
    rows.toDF("g", "value")

  private def fin(st: DataFrame): Set[Row4] =
    IncrementalRollup.finalize(st, keys)
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().map(t => Row4(t._1, t._2, t._3, (t._4, t._5, t._6))).toSet

  case class Row4(g: String, n: Long, total: Double, rest: (Double, Double, Double))

  test("merge(state(base), state(delta)) == state(base ∪ delta) exactly") {
    val base = facts("a" -> 1.11, "a" -> 2.22, "b" -> 5.0)
    val delta = facts("a" -> 3.33, "c" -> 7.77)
    val incremental = IncrementalRollup.merge(
      IncrementalRollup.state(base, keys, "value"),
      IncrementalRollup.state(delta, keys, "value"), keys)
    val full = IncrementalRollup.state(base.unionByName(delta), keys, "value")
    assert(fin(incremental) == fin(full))
  }

  test("merge is associative and order-insensitive across three deltas") {
    val d1 = facts("a" -> 1.0, "b" -> 2.0)
    val d2 = facts("a" -> 3.5)
    val d3 = facts("b" -> 0.25, "c" -> 9.0)
    def st(df: DataFrame) = IncrementalRollup.state(df, keys, "value")
    val left = IncrementalRollup.merge(IncrementalRollup.merge(st(d1), st(d2), keys), st(d3), keys)
    val right = IncrementalRollup.merge(st(d3), IncrementalRollup.merge(st(d2), st(d1), keys), keys)
    val full = st(d1.unionByName(d2).unionByName(d3))
    assert(fin(left) == fin(full))
    assert(fin(right) == fin(full))
  }

  test("finalize derives avg from exact integer math (no double .5-edge)") {
    // total 1127.86 over 16 rows: 70.49125 — the exact .5 fourth digit
    // that splits HALF_UP engines from binary-rounding engines.
    val df = facts(Seq.fill(15)("a" -> 70.0) :+ ("a" -> 77.86): _*)
    val out = IncrementalRollup.finalize(IncrementalRollup.state(df, keys, "value"), keys)
      .select("avg_v").as[Double].head()
    assert(out == 70.4912) // truncating integer div: 7049125 * 10 DIV 16... floor
  }

  test("joinViewDelta: merged state equals the full rejoin; ΔL⋈ΔR term is load-bearing") {
    // keys chosen so every delta term matches something: k1 old⋈old,
    // k2 ΔL⋈R, k3 L⋈ΔR, k4 ΔL⋈ΔR.
    val lOld = Seq((1L, "g"), (3L, "g")).toDF("k", "g")
    val lDel = Seq((2L, "g"), (4L, "g")).toDF("k", "g")
    val rOld = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "value")
    val rDel = Seq((3L, 4.0), (4L, 8.0)).toDF("k", "value")
    val jk = Seq("k")
    def st(df: DataFrame) = IncrementalRollup.state(df, keys, "value")
    val incremental = IncrementalRollup.merge(
      st(lOld.join(rOld, jk)),
      st(IncrementalRollup.joinViewDelta(lOld, lDel, rOld, rDel, jk)), keys)
    val full = st(lOld.unionByName(lDel).join(rOld.unionByName(rDel), jk))
    assert(fin(incremental) == fin(full))
    assert(fin(full).head.n == 4L) // all four provenance classes joined
    // red: the naive two-term delta (forgetting ΔL⋈ΔR) undercounts
    val naive = IncrementalRollup.merge(
      st(lOld.join(rOld, jk)),
      st(lDel.join(rOld, jk).unionByName(lOld.join(rDel, jk))), keys)
    assert(fin(naive) != fin(full))
  }
}
