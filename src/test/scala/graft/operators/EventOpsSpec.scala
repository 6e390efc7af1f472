package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val events = Seq(
    (1L, ts("2026-01-01 10:00:00"), 100L, "click", 1.0, """{"k": 7}"""),
    (2L, ts("2026-01-01 10:02:00"), 100L, "click", 2.0, """{"k": "oops"}"""),
    (3L, ts("2026-01-01 10:07:30"), 100L, "view", 4.0, """{"x": 1}"""),
    (4L, ts("2026-01-01 10:00:00"), 200L, "click", 8.0, null),
    (5L, ts("2026-01-01 10:02:00"), 100L, "click", 16.0, """{"k": 3}"""),
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("tumblingAgg: epoch-aligned buckets, exact double totals") {
    val out = EventOps.tumblingAgg(events, 5)
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(("2026-01-01 10:00:00.0", "click")) == (4L, 27.0))
    assert(out(("2026-01-01 10:05:00.0", "view")) == (1L, 4.0))
  }

  test("sessionAgg: exact-gap event MERGES (closed boundary), 1s over splits") {
    // Pins Spark session_window boundary semantics (the ex02 oracle's
    // strict `>` depends on this): an event exactly gap-after the
    // previous one belongs to the SAME session; one second more splits.
    val boundary = Seq(
      (1L, ts("2026-01-01 09:00:00"), 1L, "a", 0.0, null.asInstanceOf[String]),
      (2L, ts("2026-01-01 09:10:00"), 1L, "a", 0.0, null.asInstanceOf[String]), // exact gap
      (3L, ts("2026-01-01 09:20:01"), 1L, "a", 0.0, null.asInstanceOf[String]), // gap + 1s
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.sessionAgg(boundary, 10).orderBy("session_start").collect()
    assert(out.length == 2)
    assert(out(0).getLong(3) == 2L) // events 1,2 merge on the exact boundary
    assert(out(0).getTimestamp(2) == ts("2026-01-01 09:20:00")) // end = last + gap
    assert(out(1).getLong(3) == 1L) // event 3 starts a new session
  }

  test("dedupKeyed keeps earliest event per key with event_id tiebreak") {
    val out = EventOps.dedupKeyed(events, Seq("user_id", "event_type"))
      .select("event_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L, 4L)) // events 2,5 are later clicks of user 100
  }

  test("distinct exact vs approx: approx within rsd of exact") {
    val exact = EventOps.distinctUsers(events)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact == Map("click" -> 2L, "view" -> 1L))
    val approx = EventOps.approxDistinctUsers(events)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, v) => assert(math.abs(v - exact(k)) <= 1) }
  }

  test("slidingAgg: each event lands in exactly windowLen/slide buckets") {
    val out = EventOps.slidingAgg(events, 10, 5)
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // clicks at 10:00, 10:02, 10:02 fall in [09:55,10:05) and [10:00,10:10)
    assert(out(("2026-01-01 09:55:00.0", "click")) == (4L, 27.0))
    assert(out(("2026-01-01 10:00:00.0", "click")) == (4L, 27.0))
    // view at 10:07:30 falls in [10:00,10:10) and [10:05,10:15)
    assert(out(("2026-01-01 10:00:00.0", "view")) == (1L, 4.0))
    assert(out(("2026-01-01 10:05:00.0", "view")) == (1L, 4.0))
    assert(out.size == 4)
  }

  test("asofJoin: latest right at-or-before left ts; null when none") {
    val left = Seq(
      (10L, 1L, ts("2026-01-01 10:05:00")),
      (11L, 1L, ts("2026-01-01 10:00:00")), // exactly simultaneous right
      (12L, 1L, ts("2026-01-01 09:00:00")), // before any right
      (13L, 2L, ts("2026-01-01 12:00:00")), // other key, no rights
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts("2026-01-01 09:30:00"), 1.0),
      (1L, ts("2026-01-01 10:00:00"), 2.0),
      (1L, ts("2026-01-01 10:30:00"), 3.0), // after every left
    ).toDF("user_id", "ts", "value")
    val out = EventOps.asofJoin(left, right, "user_id", "ts", Seq("value"), "click_")
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)).map(_.toString), Option(r.get(4))))
      .toMap
    assert(out(10L) == (Some("2026-01-01 10:00:00.0"), Some(2.0)))
    assert(out(11L) == (Some("2026-01-01 10:00:00.0"), Some(2.0))) // <= matches
    assert(out(12L) == (None, None))
    assert(out(13L) == (None, None))
  }

  test("intervalJoinBinned equals the plain range join, incl. bin-edge intervals") {
    val points = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00")),
      (2L, 1L, ts("2026-01-01 10:14:59")),
      (3L, 1L, ts("2026-01-01 10:15:00")), // exactly at an interval end (exclusive)
      (4L, 2L, ts("2026-01-01 10:05:00")), // right key, no interval
      (5L, 1L, ts("2026-01-01 23:00:00")), // outside all intervals
    ).toDF("event_id", "user_id", "ts")
    val intervals = Seq(
      (1L, ts("2026-01-01 10:00:00"), ts("2026-01-01 10:15:00")),
      (1L, ts("2026-01-01 10:15:00"), ts("2026-01-01 10:40:00")), // crosses bins
    ).toDF("user_id", "start", "end")
    val out = EventOps.intervalJoinBinned(points, intervals,
      "user_id", "ts", "start", "end", 10)
      .select("event_id", "start").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).toString).toMap
    assert(out == Map(
      1L -> "2026-01-01 10:00:00.0",
      2L -> "2026-01-01 10:00:00.0",
      3L -> "2026-01-01 10:15:00.0")) // end-exclusive: joins the NEXT interval
    // equality with the naive range join
    val naive = points.join(intervals, Seq("user_id"))
      .filter(col("ts") >= col("start") && col("ts") < col("end"))
      .select("event_id", "start").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).toString).toMap
    assert(out == naive)
  }

  test("jsonExtractAgg: non-numeric and absent k excluded from count and sum") {
    val out = EventOps.jsonExtractAgg(events)
      .collect().map(r => (r.getString(0), r.get(1), r.getLong(2))).toSet
    assert(out.contains(("click", 10L, 2L))) // 7 + 3; "oops" and null props excluded
    assert(out.contains(("view", null, 0L)))
  }

  test("kmvDistinctUsers: exact under k, close and deterministic above k") {
    val big = ((1L to 2000L).map(u => ("big", u)) ++ (1L to 10L).map(u => ("small", u)))
      .toDF("event_type", "user_id")
      // duplicate every event: distinct-ness must not double-count
      .unionAll(((1L to 2000L).map(u => ("big", u)) ++ (1L to 10L).map(u => ("small", u)))
        .toDF("event_type", "user_id"))
    val est = EventOps.kmvDistinctUsers(big, 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est("small") == 10.0, "fewer than k distinct → exact count")
    assert(math.abs(est("big") - 2000.0) / 2000.0 < 0.4,
      s"k=64 estimate within sampling error: ${est("big")}")
    val again = EventOps.kmvDistinctUsers(big, 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est == again, "deterministic estimator")
  }

  test("kmvSetOverlap: exact set algebra under k; estimates and identities above k") {
    val h = (s: String) => // any injective 60-bit stand-in works for the test
      java.nio.ByteBuffer.wrap(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))).getLong >>> 4
    // A = {1..40}, B = {21..60} → |A∪B| = 60, |A∩B| = 20, J = 1/3 —
    // all under k=64, so every estimate must be EXACT.
    val rows = ((1 to 40).map(i => ("a", h(s"x$i"))) ++
      (21 to 60).map(i => ("b", h(s"x$i")))).toDF("src", "h")
    val out = EventOps.kmvSetOverlap(rows, "src", "h", 64).collect().head
    assert(out.getAs[String]("src_a") == "a" && out.getAs[String]("src_b") == "b")
    assert(out.getAs[Double]("est_union") == 60.0)
    assert(math.abs(out.getAs[Double]("jaccard") - 20.0 / 60) < 1e-6)
    assert(math.abs(out.getAs[Double]("est_inter") - 20.0) < 1e-3)
    // Above k: disjoint sets → jaccard 0; identical sets → jaccard 1,
    // union estimate within sampling error of the true 2000.
    val big = ((1 to 2000).map(i => ("p", h(s"p$i"))) ++
      (1 to 2000).map(i => ("q", h(s"p$i"))) ++
      (1 to 2000).map(i => ("r", h(s"r$i")))).toDF("src", "h")
    val m = EventOps.kmvSetOverlap(big, "src", "h", 64).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (uPq, jPq, iPq) = m(("p", "q"))
    assert(jPq == 1.0 && math.abs(uPq - 2000) / 2000 < 0.4 && iPq == uPq)
    assert(m(("p", "r"))._2 == 0.0 && m(("p", "r"))._3 == 0.0)
  }

  test("kmvSetOverlap: hashes outside the 60-bit md5-prefix convention raise") {
    // The (k−1)·2⁶⁰/h_k estimator silently mis-scales on full-64-bit
    // or negative hashes — the sketch projection must reject them.
    val neg = Seq(("a", -5L), ("b", 7L)).toDF("src", "h")
    val e = intercept[Exception] {
      EventOps.kmvSetOverlap(neg, "src", "h", 64).collect()
    }
    assert(e.getMessage.contains("md5-prefix"), e.getMessage)
    val wide = Seq(("a", 1L << 62), ("b", 7L)).toDF("src", "h")
    val e2 = intercept[Exception] {
      EventOps.kmvSetOverlap(wide, "src", "h", 64).collect()
    }
    assert(e2.getMessage.contains("md5-prefix"), e2.getMessage)
  }

  test("quantileSketch: exact type-1 quantiles when the group fits in k") {
    // n = 100 ≤ k = 256 → the sample IS the group, so every estimate
    // must be the exact order statistic at rank ⌈q·n⌉.
    val rows = (1 to 100).map(i => (i.toLong, "a", i.toDouble))
      .toDF("id", "g", "v")
    val got = EventOps.quantileSketch(rows, "g", "id", "v",
        Seq(0.25, 0.5, 0.75, 1.0), 256)
      .collect().map(r => r.getDouble(1) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(got(0.25) == (25.0, 100L))
    assert(got(0.5) == (50.0, 100L))
    assert(got(0.75) == (75.0, 100L))
    assert(got(1.0) == (100.0, 100L))
  }

  test("quantileSketch: sampled estimates stay within O(1/sqrt(k)) rank error") {
    // 20k uniform values, k = 256: Hoeffding puts the rank error well
    // under 3/sqrt(k) ≈ 0.19 with overwhelming probability; assert a
    // loose 0.15 on a fixed (deterministic md5) fixture.
    val n = 20000
    val rows = (1 to n).map(i => (i.toLong, "a", (i * 37 % n).toDouble))
      .toDF("id", "g", "v")
    val got = EventOps.quantileSketch(rows, "g", "id", "v",
        Seq(0.1, 0.5, 0.9), 256)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    got.foreach { case (q, est) =>
      val rank = est / n // values are a permutation of 0..n-1 → CDF(v) ≈ v/n
      assert(math.abs(rank - q) < 0.15, s"q=$q est=$est rank=$rank")
    }
    // and nulls are excluded, not pooled
    val withNulls = rows.union(Seq((90001L, "a", null.asInstanceOf[java.lang.Double]))
      .toDF("id", "g", "v"))
    assert(EventOps.quantileSketch(withNulls, "g", "id", "v", Seq(0.5), 256)
      .head.getLong(3) == 256L)
  }

  test("QuantileBottomK merges are partition-invariant (semilattice, host-side)") {
    // sketch(whole) == fold of per-shard sketches for ANY split — the
    // distributed-correctness property (same shape as the KMV test).
    val agg = new QuantileBottomK(256)
    def sketch(rows: Seq[QsRow]): QsBuf = rows.foldLeft(agg.zero)(agg.reduce)
    val rows = (1 to 5000).map { i =>
      QsRow((i * 2654435761L) % (1L << 60), (i % 97).toDouble)
    }
    val whole = sketch(rows)
    Seq(3, 7, 64).foreach { shards =>
      val parts = rows.grouped(rows.length / shards + 1).map(sketch).toSeq
      assert(parts.reduce(agg.merge) == whole, s"$shards-shard merge diverged")
      // reversed merge order too — commutativity, not just associativity
      assert(parts.reverse.reduce(agg.merge) == whole)
    }
  }

  test("CMS: bounded cells, estimates upper-bound truth, exact at ample width") {
    val words = Seq.fill(50)("hot") ++ Seq.fill(20)("warm") ++
      (1 to 30).map(i => s"cold$i")
    val df = words.toDF("term")
    val sketch = EventOps.cmsSketch(df, "term", depth = 4, width = 8)
    assert(sketch.count() <= 4 * 8, "sketch must stay within depth*width cells")
    // estimates never undercount (min over rows of inflated buckets)
    val truth = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val est = EventOps.cmsTopK(df, "term", 100, depth = 4, width = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (w, c) =>
      assert(est(w) >= c, s"CMS undercounted $w: ${est(w)} < $c")
    }
    // with ample width the top-k equals the exact ranking
    val wide = EventOps.cmsTopK(df, "term", 2, depth = 4, width = 4096)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(wide == Seq(("hot", 50L), ("warm", 20L)))
  }

  test("KmvBottomK state never exceeds k through reduce, merge, finish") {
    val k = 8
    val agg = new KmvBottomK(k)
    // deterministic pseudo-random insertion order with duplicates
    val hashes = (1 to 500).map(i => ((i * 7919L) % 97) + 1)
    var buf = agg.zero
    hashes.foreach { h =>
      buf = agg.reduce(buf, h)
      assert(buf.hs.length <= k, s"reduce grew the buffer past k: ${buf.hs.length}")
      assert(buf.hs == buf.hs.sorted && buf.hs.distinct == buf.hs,
        "buffer must stay sorted and distinct")
    }
    var other = agg.zero
    (1L to 200L).foreach(h => other = agg.reduce(other, h * 3 % 101))
    val merged = agg.merge(buf, other)
    assert(merged.hs.length <= k, "merge must re-truncate to k")
    // finish = (k, k-th smallest distinct value over BOTH inputs)
    val allDistinct = (hashes ++ (1L to 200L).map(_ * 3 % 101)).distinct.sorted
    assert(agg.finish(merged) == KmvSketch(k.toLong, allDistinct(k - 1)))
  }

  test("gapFillHourly densifies the hours between a key's first and last event") {
    import spark.implicits._
    val ts = (h: Int, m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val ev = Seq(
      (1L, ts(0, 15), 10.0),
      (1L, ts(3, 45), 2.5),   // hours 1 and 2 are gaps
      (2L, ts(5, 0), 1.0),    // single-hour key → one row, no gaps
    ).toDF("user_id", "ts", "value")
    val out = EventOps.gapFillHourly(ev, "user_id", "ts", "value")
      .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, ts(0, 0), 1L, 10.0),
      (1L, ts(1, 0), 0L, 0.0),
      (1L, ts(2, 0), 0L, 0.0),
      (1L, ts(3, 0), 1L, 2.5),
      (2L, ts(5, 0), 1L, 1.0)))
  }

  test("funnel: stage i+1 only counts events strictly after stage i") {
    import spark.implicits._
    val t = (s: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val ev = Seq(
      // user 1 completes in order
      (1L, t(1), "view"), (1L, t(2), "click"), (1L, t(3), "purchase"),
      // user 2: click BEFORE its first view must not count; no purchase
      (2L, t(1), "click"), (2L, t(2), "view"), (2L, t(3), "click"),
      // user 3: purchase before click → t3 null even though a purchase exists
      (3L, t(1), "view"), (3L, t(2), "purchase"), (3L, t(3), "click"),
      // user 4: never views → all null
      (4L, t(1), "error"),
    ).toDF("user_id", "ts", "event_type")
    val out = EventOps.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Long, Option[java.sql.Timestamp], Option[java.sql.Timestamp], Option[java.sql.Timestamp])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == (Some(t(1)), Some(t(2)), Some(t(3))))
    assert(out(2L) == (Some(t(2)), Some(t(3)), None))
    assert(out(3L) == (Some(t(1)), Some(t(3)), None))
    assert(out(4L) == (None, None, None))
  }

  test("histogramQuantiles: estimate within one binWidth above the exact rank statistic") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf0001)
    val binWidth = 5.0
    val qs = Seq(0.5, 0.95, 0.99)
    val est = EventOps.histogramQuantiles(ev, "event_type", "value", binWidth, qs)
      .as[(String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val exact = ev.select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((tpe, vals) <- exact; q <- qs) {
      val v = vals(math.ceil(q * vals.length).toInt - 1) // ⌈qn⌉-th smallest
      val e = est((tpe, q))
      // v lands in bin ⌊v/w⌋ and the estimate is that bin's upper edge
      // (or a lower bin's, never higher than v's bin edge)
      assert(e > v - binWidth && e <= v + binWidth,
        s"$tpe q=$q: est $e vs exact rank stat $v (binWidth $binWidth)")
    }
    // deterministic: the same call yields identical rows
    val again = EventOps.histogramQuantiles(ev, "event_type", "value", binWidth, qs)
      .as[(String, Double, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(again == est)
  }

  test("sequencePattern: non-overlapping matches in (ts, id) order; id breaks ts ties") {
    // user 1: v c c p v p → "vccpvp": v[ces]*p matches "vccp" then "vp".
    // Events 2 and 3 share a timestamp — event_id orders c before the
    // SECOND c (id 3), pinning the canonical string.
    // user 2: p c v → no match (no v before a p).
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "view", 0.0, null.asInstanceOf[String]),
      (2L, ts("2026-01-01 10:01:00"), 1L, "click", 0.0, null.asInstanceOf[String]),
      (3L, ts("2026-01-01 10:01:00"), 1L, "click", 0.0, null.asInstanceOf[String]),
      (4L, ts("2026-01-01 10:02:00"), 1L, "purchase", 0.0, null.asInstanceOf[String]),
      (5L, ts("2026-01-01 10:03:00"), 1L, "view", 0.0, null.asInstanceOf[String]),
      (6L, ts("2026-01-01 10:04:00"), 1L, "purchase", 0.0, null.asInstanceOf[String]),
      (7L, ts("2026-01-01 10:00:00"), 2L, "purchase", 0.0, null.asInstanceOf[String]),
      (8L, ts("2026-01-01 10:01:00"), 2L, "click", 0.0, null.asInstanceOf[String]),
      (9L, ts("2026-01-01 10:02:00"), 2L, "view", 0.0, null.asInstanceOf[String]),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def run() = EventOps.sequencePattern(ev, "user_id", "ts", "event_id",
      substring(col("event_type"), 1, 1), "v[ces]*p")
      .select("user_id", "seq_len", "n_matches")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val out = run()
    assert(out(1L) == ((6L, 2L)))
    assert(out(2L) == ((3L, 0L)))
    // deterministic rerun — the collapsed string is canonical
    assert(run() == out)
  }

  test("sequencePattern: whale entities are capped-and-flagged, never collected") {
    // user 1: 12 events (> maxSeqLen = 10) — must come back capped with
    // the TRUE event count and a NULL match count; user 2 (3 events)
    // matches normally and must be unaffected by the whale's presence.
    val whale = (1L to 12L).map(i =>
      (i, ts("2026-01-01 10:00:00"), 1L, "view", 0.0, null.asInstanceOf[String]))
    val small = Seq(
      (100L, ts("2026-01-01 10:00:00"), 2L, "view", 0.0, null.asInstanceOf[String]),
      (101L, ts("2026-01-01 10:01:00"), 2L, "click", 0.0, null.asInstanceOf[String]),
      (102L, ts("2026-01-01 10:02:00"), 2L, "purchase", 0.0, null.asInstanceOf[String]))
    val ev = (whale ++ small)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = EventOps.sequencePattern(ev, "user_id", "ts", "event_id",
      substring(col("event_type"), 1, 1), "v[ces]*p", maxSeqLen = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))).toMap
    assert(rows(1L) == ((12L, -1L, true)), "whale: true count, NULL matches, capped")
    assert(rows(2L) == ((3L, 1L, false)), "small entity unaffected")
    // red-test the boundary: exactly maxSeqLen events is NOT capped
    val atCap = EventOps.sequencePattern(ev.filter(col("user_id") === 1L)
      .limit(10), "user_id", "ts", "event_id",
      substring(col("event_type"), 1, 1), "v[ces]*p", maxSeqLen = 10)
      .collect()
    assert(atCap.length == 1 && !atCap(0).getBoolean(3))
  }

  test("sequencePattern: cross-engine-ambiguous patterns are rejected") {
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "view", 0.0, null.asInstanceOf[String]))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def run(p: String) = EventOps.sequencePattern(ev, "user_id", "ts",
      "event_id", substring(col("event_type"), 1, 1), p)
    intercept[IllegalArgumentException](run("v.*p"))        // unbounded '.'
    intercept[IllegalArgumentException](run("v[^x]*p"))     // negated class
    intercept[IllegalArgumentException](run("v[cep]*p"))    // class holds anchor 'p'
    intercept[IllegalArgumentException](run("v[vce]+p"))    // class holds anchor 'v'
    run("v[ces]*p").collect()                               // the compliant form passes
  }

  test("ohlcBars: open/close picked by (ts, id) order, ties broken by id; exact decimal totals") {
    // One 15-min bar for type "a": ids 1..4. Events 1 and 2 share the
    // opening timestamp — id 1 must win open; 3 and 4 share the closing
    // timestamp — id 4 must win close.
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "a", 5.0, null.asInstanceOf[String]),
      (2L, ts("2026-01-01 10:00:00"), 1L, "a", 9.0, null.asInstanceOf[String]),
      (3L, ts("2026-01-01 10:10:00"), 1L, "a", 1.0, null.asInstanceOf[String]),
      (4L, ts("2026-01-01 10:10:00"), 1L, "a", 7.0, null.asInstanceOf[String]),
      (5L, ts("2026-01-01 10:20:00"), 1L, "a", 2.0, null.asInstanceOf[String]),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.ohlcBars(ev, 15).orderBy("bucket_start").collect()
    assert(out.length == 2)
    val bar0 = out(0)
    assert(bar0.getTimestamp(0).toString == "2026-01-01 10:00:00.0")
    assert(bar0.getDouble(2) == 5.0, "open = id-1 value on the tied open ts")
    assert(bar0.getDouble(3) == 9.0 && bar0.getDouble(4) == 1.0)
    assert(bar0.getDouble(5) == 7.0, "close = id-4 value on the tied close ts")
    assert(bar0.getLong(6) == 4L && bar0.getDouble(7) == 22.0)
    assert(out(1).getDouble(2) == 2.0 && out(1).getDouble(5) == 2.0)
  }

  test("transitionMatrix: per-user consecutive pairs, exact per-state probabilities") {
    // user 1: a b a c → (a,b), (b,a), (a,c); user 2: a b → (a,b).
    // From a: b 2/3, c 1/3. From b: a 1/1. Cross-user pairs must NOT
    // appear (no b→a bridging user 1's end to user 2's start).
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "a", 0.0, null.asInstanceOf[String]),
      (2L, ts("2026-01-01 10:01:00"), 1L, "b", 0.0, null.asInstanceOf[String]),
      (3L, ts("2026-01-01 10:02:00"), 1L, "a", 0.0, null.asInstanceOf[String]),
      (4L, ts("2026-01-01 10:03:00"), 1L, "c", 0.0, null.asInstanceOf[String]),
      (5L, ts("2026-01-01 10:00:00"), 2L, "a", 0.0, null.asInstanceOf[String]),
      (6L, ts("2026-01-01 10:01:00"), 2L, "b", 0.0, null.asInstanceOf[String]),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.transitionMatrix(ev, "user_id", "ts", "event_id", "event_type")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out == Map(
      ("a", "b") -> ((2L, 0.666667)),
      ("a", "c") -> ((1L, 0.333333)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("attributeLastTouch: lookback, exact-ts touch, simultaneous-touch tiebreak") {
    val ev = Seq(
      // user 1: touch 10 days before conversion -> outside 7-day window -> direct
      (1L, ts("2026-01-01 10:00:00"), 1L, "view", 0.0, null.asInstanceOf[String]),
      (2L, ts("2026-01-11 10:00:00"), 1L, "purchase", 5.0, null.asInstanceOf[String]),
      // user 2: two touches; the LATER one (click) wins
      (3L, ts("2026-01-10 09:00:00"), 2L, "view", 0.0, null.asInstanceOf[String]),
      (4L, ts("2026-01-10 10:00:00"), 2L, "click", 0.0, null.asInstanceOf[String]),
      (5L, ts("2026-01-10 11:00:00"), 2L, "purchase", 7.0, null.asInstanceOf[String]),
      // user 3: touch at EXACTLY the conversion ts counts (<= semantics)
      (6L, ts("2026-01-10 11:00:00"), 3L, "view", 0.0, null.asInstanceOf[String]),
      (7L, ts("2026-01-10 11:00:00"), 3L, "purchase", 9.0, null.asInstanceOf[String]),
      // user 4: SIMULTANEOUS touches -> max event_id (the click, id 9) wins
      (8L, ts("2026-01-10 08:00:00"), 4L, "view", 0.0, null.asInstanceOf[String]),
      (9L, ts("2026-01-10 08:00:00"), 4L, "click", 0.0, null.asInstanceOf[String]),
      (10L, ts("2026-01-10 09:00:00"), 4L, "purchase", 3.0, null.asInstanceOf[String]),
      // user 5: no touch at all -> direct
      (11L, ts("2026-01-10 09:00:00"), 5L, "purchase", 2.0, null.asInstanceOf[String]),
      // a 7-days-minus-a-second touch is INSIDE the window (>= boundary)
      (12L, ts("2026-01-03 10:00:01"), 6L, "view", 0.0, null.asInstanceOf[String]),
      (13L, ts("2026-01-10 10:00:00"), 6L, "purchase", 4.0, null.asInstanceOf[String]),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.attributeLastTouch(ev, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click"), "purchase", lookbackDays = 7)
      .select("user_id", "channel").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "direct", 2L -> "click", 3L -> "view",
      4L -> "click", 5L -> "direct", 6L -> "view"))
  }

  test("attributeLastTouch guards: bad lookback, empty/overlapping touch types raise") {
    def run(touch: Seq[String], conv: String, days: Int) =
      EventOps.attributeLastTouch(events, "user_id", "ts", "event_id",
        "event_type", touch, conv, days)
    intercept[IllegalArgumentException] { run(Seq("view"), "purchase", 0) }
    intercept[IllegalArgumentException] { run(Seq.empty, "purchase", 7) }
    intercept[IllegalArgumentException] { run(Seq("view", "purchase"), "purchase", 7) }
  }
}
