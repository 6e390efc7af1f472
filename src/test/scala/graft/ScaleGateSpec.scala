package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.ScaleCheck.{Row, violations}

/** The scale gate's failure logic (round-9 verdict item 2): ScaleCheck
  * must go RED — nonzero exit — on a planted quadratic or a nested-loop
  * flip, not merely record it in SCALECHECK.json for a human to notice
  * a round later (as dd17's 122× was). Pure-function tests; `main`
  * wires `violations` straight to `sys.exit(1)`. */
class ScaleGateSpec extends AnyFunSuite {

  private val cleanJoins = Map("bhj" -> 1, "smj" -> 0, "shj" -> 0, "bnlj" -> 0)

  private def ok(name: String, ratio: Double) =
    Row(name, 1.0, ratio, ratio, None, cleanJoins, cleanJoins)

  test("clean sub-linear rows pass") {
    val rows = Seq(ok("q1", 1.2), ok("q2", 9.8), ok("q3", 0.7))
    assert(violations(rows, maxRatio = 20.0).isEmpty)
  }

  test("planted quadratic fails the gate") {
    // A quadratic at 10x replication lands near 10^2 = 100x — exactly
    // the shape dd17 showed (121.98x) before the banded-LSH fix.
    val rows = Seq(ok("good", 3.3), ok("dd_planted_quadratic", 121.98))
    val v = violations(rows, maxRatio = 20.0)
    assert(v.size == 1)
    assert(v.head.contains("dd_planted_quadratic"))
    assert(v.head.contains("super-linear"))
  }

  test("ratio exactly at the threshold passes; just above fails") {
    assert(violations(Seq(ok("q", 20.0)), 20.0).isEmpty)
    assert(violations(Seq(ok("q", 20.01)), 20.0).nonEmpty)
  }

  test("broadcast nested-loop join APPEARING at scale fails the gate") {
    val flipped = Row("q_flip", 1.0, 2.0, 2.0, None,
      cleanJoins, cleanJoins.updated("bnlj", 1))
    val v = violations(Seq(flipped), 20.0)
    assert(v.size == 1 && v.head.contains("BroadcastNestedLoopJoin flip"))
  }

  test("deliberate base-scale BNLJ (whitelisted crossJoin) does NOT trip the flip check") {
    // ann01-style brute-force ground truth: bnlj at BOTH scales is the
    // declared plan, not a flip.
    val stable = Row("ann01", 1.0, 1.1, 1.1, None,
      cleanJoins.updated("bnlj", 1), cleanJoins.updated("bnlj", 1))
    assert(violations(Seq(stable), 20.0).isEmpty)
  }

  test("an error at either scale fails the gate") {
    val errRow = Row("q_err", 1.0, -1.0, -1.0, Some("AnalysisException"),
      Map.empty, Map.empty)
    val v = violations(Seq(errRow), 20.0)
    assert(v.size == 1 && v.head.contains("ERROR AnalysisException"))
  }

  test("errored rows do not double-report a ratio violation (ratio sentinel is -1)") {
    val errRow = Row("q_err", 1.0, 999.0, -1.0, Some("OutOfMemoryError"),
      Map.empty, Map.empty)
    assert(violations(Seq(errRow), 20.0).size == 1)
  }
}
