package graft.operators

import graft.SparkSpec

class AffinitySpec extends SparkSpec {
  import spark.implicits._

  // b1 {A,B,C}, b2 {A,B}, b3 {A,C}, b4 {B,D} — with a duplicate (b4,B)
  // membership row that must collapse before counting.
  private val items = Seq(
    (1L, "A"), (1L, "B"), (1L, "C"),
    (2L, "A"), (2L, "B"),
    (3L, "A"), (3L, "C"),
    (4L, "B"), (4L, "B"), (4L, "D"),
  ).toDF("basket", "item")

  test("coOccurrence: hand-computed support and lift; duplicate memberships collapse") {
    val out = Affinity.coOccurrence(items, "basket", "item", minCount = 2L)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // N=4 baskets; nf: A=3, B=3, C=2, D=1.
    // (A,B) in b1,b2 → lift 2·4/(3·3) = 0.888889
    // (A,C) in b1,b3 → lift 2·4/(3·2) = 1.333333
    assert(out == Map(
      ("A", "B") -> ((2L, 0.888889)),
      ("A", "C") -> ((2L, 1.333333))))
  }

  test("coOccurrence: minCount=1 admits singleton pairs; pairs stay canonical item1 < item2") {
    val out = Affinity.coOccurrence(items, "basket", "item", minCount = 1L)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out.keySet == Set(("A", "B"), ("A", "C"), ("B", "C"), ("B", "D")))
    assert(out.keys.forall { case (a, b) => a < b })
    // (B,D): 1·4/(3·1) = 1.333333 — D only ever appears with B
    assert(out(("B", "D")) == ((1L, 1.333333)))
    val e = intercept[IllegalArgumentException] {
      Affinity.coOccurrence(items, "basket", "item", minCount = 0L)
    }
    assert(e.getMessage.contains("minCount"))
  }

  test("coOccurrence: null basket or item rows drop; deterministic rerun") {
    val withNulls = items.unionAll(
      Seq((Option.empty[Long], Option("A")), (Option(9L), Option.empty[String]))
        .toDF("basket", "item"))
    val run1 = Affinity.coOccurrence(withNulls, "basket", "item", 2L)
      .as[(String, String, Long, Double)].collect().toSet
    val base = Affinity.coOccurrence(items, "basket", "item", 2L)
      .as[(String, String, Long, Double)].collect().toSet
    assert(run1 == base, "null memberships must not perturb counts")
    val run2 = Affinity.coOccurrence(withNulls, "basket", "item", 2L)
      .as[(String, String, Long, Double)].collect().toSet
    assert(run1 == run2)
  }
}
