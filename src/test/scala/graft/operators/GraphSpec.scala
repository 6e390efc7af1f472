package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: symmetric pair splits mass evenly; sink-heavy star ranks the hub highest") {
    // Two components: a 2-cycle (a↔b) and a star where 1..3 all point
    // at hub 10 and the hub points back at 1 only.
    val edges = Seq(
      (100L, 101L), (101L, 100L),
      (1L, 10L), (2L, 10L), (3L, 10L), (10L, 1L))
      .toDF("src", "dst")
    // 40 rounds: the 1↔10 loop oscillates with period 2 (damped by
    // d² = 0.7225 per cycle) — near convergence the hub strictly wins.
    val pr = Graph.pageRank(edges, "src", "dst", iters = 40, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    assert(pr.size == 6)
    // the 2-cycle is closed and symmetric: both nodes keep exactly 1/n
    assert(pr(100L) == pr(101L))
    assert(math.abs(pr(100L) - 1.0 / 6) < 1e-6)
    // the hub receives three nodes' full rank — strictly the largest
    assert(pr(10L) == pr.values.max)
    // 1 receives the hub's entire outflow — ranks above the leaf 2/3
    assert(pr(1L) > pr(2L) && pr(2L) == pr(3L))
  }

  test("pageRank: total mass ≈ 1 on a dangling-free graph; deterministic rerun") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("s", "t")
    val run1 = Graph.pageRank(edges, "s", "t", 5, 0.85)
      .orderBy($"node").as[(Long, Double)].collect().toSeq
    assert(math.abs(run1.map(_._2).sum - 1.0) < 1e-4)
    val run2 = Graph.pageRank(edges, "s", "t", 5, 0.85)
      .orderBy($"node").as[(Long, Double)].collect().toSeq
    assert(run1 == run2)
  }

  test("pageRank: dst-only node receives rank but its mass is not redistributed") {
    // 1 → 2, 2 has no out-edges (dangling): documented semantics — 2
    // accumulates, total mass decays below 1.
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, "src", "dst", 3, 0.85)
      .as[(Long, Double)].collect().toMap
    assert(pr.keySet == Set(1L, 2L))
    assert(pr(2L) > pr(1L))
    assert(pr.values.sum < 1.0)
  }

  test("pageRankWeighted: outflow splits proportionally to edge weight") {
    // 0 sends to 1 with weight 3 and to 2 with weight 1; both send
    // back. After one round, 1's inflow is exactly 3× 2's.
    val edges = Seq((0L, 1L, 3.0), (0L, 2L, 1.0), (1L, 0L, 1.0), (2L, 0L, 1.0))
      .toDF("src", "dst", "w")
    val pr = Graph.pageRankWeighted(edges, "src", "dst", "w", iters = 1)
      .as[(Long, Double)].collect().toMap
    val in1 = pr(1L) - 0.05 // strip teleport (1-d)/3
    val in2 = pr(2L) - 0.05
    assert(math.abs(in1 / in2 - 3.0) < 1e-3,
      s"weighted split must be 3:1, got $in1 : $in2")
    // uniform variant splits the same edges 1:1
    val u = Graph.pageRank(edges, "src", "dst", iters = 1)
      .as[(Long, Double)].collect().toMap
    assert(u(1L) == u(2L))
  }

  test("pageRankWeighted: a zero or negative per-source weight sum raises, not deflates") {
    // A 1+cos_sim edge weight is exactly 0 at cos_sim = −1; a zero Σw
    // divides to null shares that sum() silently drops — rank mass
    // would deflate with no error. The deg projection must fail loudly.
    val edges = Seq((0L, 1L, 0.0), (1L, 0L, 1.0)).toDF("src", "dst", "w")
    val e = intercept[Exception] {
      Graph.pageRankWeighted(edges, "src", "dst", "w", iters = 1).collect()
    }
    assert(e.getMessage.contains("weight sum must be > 0"), e.getMessage)
    val neg = Seq((0L, 1L, 2.0), (0L, 2L, -2.0), (1L, 0L, 1.0), (2L, 0L, 1.0))
      .toDF("src", "dst", "w")
    val e2 = intercept[Exception] {
      Graph.pageRankWeighted(neg, "src", "dst", "w", iters = 1).collect()
    }
    assert(e2.getMessage.contains("weight sum must be > 0"), e2.getMessage)
  }

  test("personalizedPageRank: mass concentrates near the seed; off-graph seeds ignored") {
    // chain 1 → 2 → 3 → 4 with back edges; seed at 1 (and a phantom
    // seed 99 that is not in the graph).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 1L), (3L, 2L), (4L, 3L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 99L).toDF("id")
    val pr = Graph.personalizedPageRank(edges, "src", "dst", seeds, "id",
      iters = 20, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    assert(pr.keySet == Set(1L, 2L, 3L, 4L), "phantom seed stays out")
    // proximity to the seed decays down the chain (node 1 funnels its
    // whole rank into 2, so 2 edges out 1 — but both dominate 3 and 4)
    assert(pr(2L) > pr(3L) && pr(3L) > pr(4L) && pr(1L) > pr(3L))
    // a node with no walk from the seed would be 0; all are reachable
    assert(pr(4L) > 0.0)
    val e = intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, "src", "dst",
        Seq(99L).toDF("id"), "id")
    }
    assert(e.getMessage.contains("seed"))
  }

  test("triangleStats: hand-counted K4-minus-an-edge; duplicates, direction, self-loops collapse") {
    // 1-2, 1-3, 2-3, 2-4, 3-4 (K4 without 1-4) + a pendant 5-1.
    // Triangles: {1,2,3}, {2,3,4}. Noise: reversed dup (2,1), self-loop
    // (3,3) — all must collapse into the canonical undirected set.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 1L), (2L, 1L), (3L, 3L)).toDF("s", "t")
    val out = Graph.triangleStats(edges, "s", "t")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out(1L) == ((3L, 1L, Some(0.333333))))
    assert(out(2L) == ((3L, 2L, Some(0.666667))))
    assert(out(3L) == ((3L, 2L, Some(0.666667))))
    assert(out(4L) == ((2L, 1L, Some(1.0))))
    assert(out(5L) == ((1L, 0L, None)), "degree-1 node: no coefficient")
  }

  test("linkPrediction: cycle + pendant, hand-computed Jaccard; adjacent pairs excluded") {
    // 4-cycle 1-2-3-4-1 plus pendant 5-1, plus the chord 1-3 so that an
    // ADJACENT pair with common neighbors exists (must be excluded).
    // Noise: reversed duplicate (2,1) and self-loop (3,3) collapse.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (5L, 1L),
      (1L, 3L), (2L, 1L), (3L, 3L)).toDF("s", "t")
    val out = Graph.linkPrediction(edges, "s", "t", minCommon = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // (2,4): common {1,3}, deg(2)=2, deg(4)=2 → J = 2/(2+2-2) = 1.0
    assert(out((2L, 4L)) == ((2L, 1.0)))
    // (1,3) shares {2,4} but IS an edge (the chord) → excluded
    assert(!out.contains((1L, 3L)))
    assert(out.size == 1, s"only (2,4) survives minCommon=2: $out")
    // minCommon=1 admits the single-shared-neighbor pairs, e.g.
    // (2,5): common {1}, deg(2)=2, deg(5)=1 → J = 1/(2+1-1) = 0.5
    val loose = Graph.linkPrediction(edges, "s", "t", minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(loose((2L, 5L)) == ((1L, 0.5)))
    assert(loose((4L, 5L)) == ((1L, 0.5)))
    assert(loose((2L, 4L)) == ((2L, 1.0)))
    val e = intercept[IllegalArgumentException] {
      Graph.linkPrediction(edges, "s", "t", minCommon = 0)
    }
    assert(e.getMessage.contains("minCommon"))
  }

  test("kCore: fixed peel budget is honored round by round; K4 core survives") {
    // K4 on {1,2,3,4} + chain 4-5, 5-6. Noise: reversed dup (2,1) and
    // self-loop (3,3) collapse. Degrees: 4→4, K4 others→3, 5→2, 6→1.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (2L, 1L), (3L, 3L)).toDF("s", "t")
    def run(k: Int, rounds: Int): Map[Long, Long] =
      Graph.kCore(edges, "s", "t", k, rounds)
        .as[(Long, Long)].collect().toMap
    // k=2, ONE round: only 6 peels; 5 survives this round with its
    // degree fallen to 1 — the fixed-budget contract, observable.
    assert(run(2, 1) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L, 5L -> 1L))
    // k=2, TWO rounds: the second peel removes 5; K4 remains.
    assert(run(2, 2) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k=3 peels the whole chain in one round — K4 is the 3-core.
    assert(run(3, 1) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(intercept[IllegalArgumentException] {
      Graph.kCore(edges, "s", "t", 0, 1)
    }.getMessage.contains("k must"))
    assert(intercept[IllegalArgumentException] {
      Graph.kCore(edges, "s", "t", 1, 0)
    }.getMessage.contains("rounds"))
  }

  test("pageRank: empty edge list yields an empty frame with the output schema") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val out = Graph.pageRank(empty, "src", "dst")
    assert(out.columns.toSeq == Seq("node", "pagerank"))
    assert(out.count() == 0)
  }

  test("labelPropagation: majority wins, revisions propagate, ties take the smaller label, seeds stay pinned") {
    // seeds: 1→label 1, 2→label 2, 3→label 2.
    // z1, z2 each hear from seeds 2 and 3 → labeled 2 in round 1.
    // x hears from seed 1, z1, z2: round 1 only seed 1 votes (x=1);
    // round 2 votes are {1, 2, 2} → x REVISES to 2.
    // t hears from seeds 1 and 2 → tie → smaller label 1.
    // seed 2 hears from seed 1 but must keep label 2.
    // u has no labeled in-neighbors ever → absent.
    val edges = Seq(
      (2L, 10L), (3L, 10L),         // z1
      (2L, 11L), (3L, 11L),         // z2
      (1L, 20L), (10L, 20L), (11L, 20L), // x
      (1L, 30L), (2L, 30L),         // t (tie)
      (1L, 2L),                     // into a seed
      (99L, 40L))                   // unlabeled voter only
      .toDF("src", "dst")
    val seeds = Seq((1L, 1L), (2L, 2L), (3L, 2L)).toDF("n", "l")
    val r1 = Graph.labelPropagation(edges, "src", "dst", seeds, "n", "l", 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 1L, 2L -> 2L, 3L -> 2L,
      10L -> 2L, 11L -> 2L, 20L -> 1L, 30L -> 1L))
    val r2 = Graph.labelPropagation(edges, "src", "dst", seeds, "n", "l", 2)
      .as[(Long, Long)].collect().toMap
    assert(r2(20L) == 2L, "x must revise to the new majority")
    assert(r2(2L) == 2L, "seed labels are pinned")
    assert(!r2.contains(40L), "no labeled in-neighbor → stays unlabeled")
    // fixpoint: further rounds change nothing on this graph
    val r3 = Graph.labelPropagation(edges, "src", "dst", seeds, "n", "l", 3)
      .as[(Long, Long)].collect().toMap
    assert(r3 == r2)
  }

  test("labelPropagation: conflicting seed labels raise instead of double-voting") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val seeds = Seq((1L, 1L), (1L, 2L)).toDF("n", "l")
    val e = intercept[Exception] {
      Graph.labelPropagation(edges, "src", "dst", seeds, "n", "l", 1).collect()
    }
    assert(e.getMessage.contains("conflicting labels"))
  }

  test("hopDistances: chain + shortcut = min path; horizon and unreachable nodes excluded") {
    // seed 0; chain 0→1→2→3→4, shortcut 0→3 (so 3 is 1 hop, not 3),
    // back-edge 2→0 (cycle must not loop forever or lower settled
    // dists), and 9→8 unreachable from the seed.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 3L),
      (2L, 0L), (9L, 8L)).toDF("src", "dst")
    val out = Graph.hopDistances(edges, "src", "dst",
      Seq(0L).toDF("id"), "id", maxHops = 2)
      .as[(Long, Int)].collect().toMap
    assert(out == Map(0L -> 0, 1L -> 1, 3L -> 1, 2L -> 2, 4L -> 2))
  }

  test("hopDistances: multi-source takes the nearest seed; seeds outside the graph settle at 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 3L)).toDF("src", "dst")
    val out = Graph.hopDistances(edges, "src", "dst",
      Seq(1L, 5L, 77L).toDF("id"), "id", maxHops = 3)
      .as[(Long, Int)].collect().toMap
    // 3 is 1 hop from seed 5 (not 2 hops from seed 1); 77 has no edges
    assert(out == Map(1L -> 0, 5L -> 0, 77L -> 0, 2L -> 1, 3L -> 1))
  }

  test("hopDistances: empty frontier rounds are no-ops; deterministic rerun") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val run1 = Graph.hopDistances(edges, "src", "dst",
      Seq(1L).toDF("id"), "id", maxHops = 5)
      .as[(Long, Int)].collect().toMap
    assert(run1 == Map(1L -> 0, 2L -> 1))
    val run2 = Graph.hopDistances(edges, "src", "dst",
      Seq(1L).toDF("id"), "id", maxHops = 5)
      .as[(Long, Int)].collect().toMap
    assert(run1 == run2)
  }

  test("ancestorClosure: full closure incl self; unknown parent = root boundary") {
    //   1          6 -> 99 (99 has no node row: boundary, kept in 6's path)
    //  2 3
    // 4
    val edges = Seq((1L, None), (2L, Some(1L)), (3L, Some(1L)), (4L, Some(2L)),
      (6L, Some(99L))).toDF("child", "parent")
    val out = Graph.ancestorClosure(edges, "child", "parent", rounds = 3)
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1L), (2L, 2L), (2L, 1L), (3L, 3L), (3L, 1L),
      (4L, 4L), (4L, 2L), (4L, 1L), (6L, 6L), (6L, 99L)))
  }

  test("ancestorClosure: depth 2^rounds - 1 fits; depth 2^rounds raises; cycle raises") {
    def chain(n: Int) = (1 to n).map(i =>
      (i.toLong, if (i == 1) None else Some(i - 1L))).toDF("child", "parent")
    // depth 3 (three ancestors above the leaf) with rounds=2 -> < 2^2 fits
    val ok = Graph.ancestorClosure(chain(4), "child", "parent", rounds = 2)
      .as[(Long, Long)].collect()
    assert(ok.count(_._1 == 4L) == 4) // leaf sees 3 ancestors + self
    intercept[IllegalStateException] {
      // depth 4 = 2^rounds: the frontier witness hasn't nulled yet
      Graph.ancestorClosure(chain(5), "child", "parent", rounds = 2).count()
    }
    val cyc = Seq((1L, Some(2L)), (2L, Some(1L))).toDF("child", "parent")
    intercept[IllegalStateException] {
      Graph.ancestorClosure(cyc, "child", "parent", rounds = 3).count()
    }
  }

  test("ancestorClosure guards: rounds bounds enforced; empty forest is empty") {
    val edges = Seq((1L, None: Option[Long])).toDF("child", "parent")
    intercept[IllegalArgumentException] {
      Graph.ancestorClosure(edges, "child", "parent", rounds = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.ancestorClosure(edges, "child", "parent", rounds = 17)
    }
    val empty = Seq.empty[(Long, Option[Long])].toDF("child", "parent")
    assert(Graph.ancestorClosure(empty, "child", "parent").count() == 0)
  }

  test("subtreeRollup: counts and money-rounded sums per subtree") {
    val edges = Seq((1L, None), (2L, Some(1L)), (3L, Some(1L)), (4L, Some(2L)))
      .toDF("child", "parent")
    val vals = Seq((1L, 1.10), (2L, 2.25), (3L, 4.01), (4L, 8.64))
      .toDF("id", "v")
    val out = Graph.subtreeRollup(edges, "child", "parent", vals, "id", "v")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(1L -> ((4L, 16.0)), 2L -> ((2L, 10.89)),
      3L -> ((1L, 4.01)), 4L -> ((1L, 8.64))))
  }
}
