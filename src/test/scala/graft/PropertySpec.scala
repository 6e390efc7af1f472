package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.functions.{Cleaning, TextAnalysis}
import graft.streaming.StreamingOps

/** Property-based invariants (SURVEY §5.2): scalacheck generators,
  * Spark evaluated in bulk where a cluster op is under test, pure JVM
  * where the logic is host-side (session merge). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** `Gen.sample` can legitimately return None (generator backtracking);
    * a bare `.sample.get` therefore flakes with NoSuchElementException.
    * Retry
    * until a value materialises — every generator here is total, so the
    * loop terminates on the first or second draw. */
  private implicit class GenOps[T](g: Gen[T]) {
    def sampled: T = Iterator.continually(g.sample).flatten.next()
  }

  private val messyString: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)), Gen.const("  "), Gen.const("\t"),
    Gen.const("ñá"), Gen.const("X"))).map(_.mkString(" "))

  test("limpiarNombres is idempotent and produces no double spaces (bulk)") {
    val samples = Gen.listOfN(300, messyString).sampled
    val out = samples.toDF("v")
      .select(
        Cleaning.limpiarNombres(col("v")).as("once"),
        Cleaning.limpiarNombres(Cleaning.limpiarNombres(col("v"))).as("twice"))
      .collect()
    out.foreach { r =>
      assert(r.getString(0) == r.getString(1))
      assert(!r.getString(0).contains("  "))
      assert(r.getString(0) == r.getString(0).trim)
    }
  }

  test("tokens never yields empty tokens; shingle count = max(0, n-k+1)") {
    val samples = Gen.listOfN(300, messyString).sampled
    val out = samples.toDF("v")
      .select(
        TextAnalysis.tokens(col("v")).as("toks"),
        TextAnalysis.shingles(TextAnalysis.tokens(col("v")), 3).as("sh"))
      .as[(Seq[String], Seq[String])].collect()
    out.foreach { case (toks, sh) =>
      assert(!toks.contains(""))
      assert(sh.length == math.max(0, toks.length - 2))
    }
  }

  test("stateful session merge is invariant under micro-batch partitioning") {
    // The streaming sessionizer must produce the same sessions no matter
    // how the event stream is sliced into batches — this is the property
    // that makes its streaming output equal the batch session_window.
    val gapMs = 600000L
    val eventTimes: Gen[List[Long]] =
      Gen.listOfN(40, Gen.chooseNum(0L, 50L * 60000L)).map(_.map(_ / 1000 * 1000))
    val splits: Gen[List[Int]] = Gen.listOfN(40, Gen.chooseNum(0, 3))
    for (_ <- 1 to 100) {
      val ts = eventTimes.sampled
      val cut = splits.sampled
      val allAtOnce = StreamingOps.mergeAll(Nil, ts, gapMs)
      // partition ts into up to 4 batches by the cut labels, in order
      val batches = ts.zip(cut.padTo(ts.length, 0)).groupBy(_._2)
        .toList.sortBy(_._1).map(_._2.map(_._1))
      val incremental = batches.foldLeft(List.empty[StreamingOps.OpenSession]) {
        (state, batch) => StreamingOps.mergeAll(state, batch, gapMs)
      }
      assert(incremental == allAtOnce)
      // counts conserve events
      assert(allAtOnce.map(_.n).sum == ts.length)
      // sessions are disjoint and gap-separated
      allAtOnce.sliding(2).foreach {
        case List(a, b) => assert(b.start > a.last + gapMs)
        case _ => ()
      }
    }
  }

  test("KMV sketch is mergeable: bottom-k of shard unions = bottom-k of whole") {
    // The distributed-sketch property: per-shard bottom-k sets merged by
    // union → re-take-k must equal the bottom-k over all data, so the
    // per-group estimate is independent of how the data was partitioned.
    val users = Gen.listOfN(3000, Gen.chooseNum(1L, 900L)).sampled
    val k = 64
    def hash(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(u.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    }
    val whole = users.distinct.map(hash).distinct.sorted.take(k)
    val shards = users.grouped(700).toSeq
    val merged = shards.flatMap(_.distinct.map(hash).distinct.sorted.take(k))
      .distinct.sorted.take(k)
    assert(merged == whole)
    // and the engine's estimate agrees with the host-side formula
    val est = graft.operators.EventOps.kmvDistinctUsers(
      users.map(u => ("t", u)).toDF("event_type", "user_id"), k)
      .collect().head.getDouble(1)
    val expected =
      if (whole.length < k) whole.length.toDouble
      else BigDecimal((k - 1).toDouble * math.pow(2, 60) / whole.last)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(est == expected, s"est=$est expected=$expected")
  }

  test("firstWins is idempotent and keeps exactly one row per key (bulk)") {
    val rows = Gen.listOfN(500,
      Gen.zip(Gen.chooseNum(0, 40), Gen.chooseNum(0L, 1000L))).sampled
    val df = rows.toDF("k", "v")
    val order = Seq(col("v").desc, col("k").asc)
    val once = operators.Dedup.firstWins(df, Seq("k"), order)
    val twice = operators.Dedup.firstWins(once, Seq("k"), order)
    assert(once.collect().toSet == twice.collect().toSet)
    assert(once.select("k").distinct().count() == once.count())
    assert(once.count() == rows.map(_._1).distinct.length)
  }

  test("incremental rollup merge == full recompute for ANY split of the facts (bulk)") {
    val rows = Gen.listOfN(400,
      Gen.zip(Gen.chooseNum(0, 15), Gen.chooseNum(0, 99999))).sampled
      .map { case (g, cents) => (s"g$g", cents / 100.0) }
    val df = rows.toDF("g", "value")
    val keys = Seq("g")
    def fin(st: org.apache.spark.sql.DataFrame) =
      operators.IncrementalRollup.finalize(st, keys).collect().map(_.toSeq).toSet
    val full = operators.IncrementalRollup.state(df, keys, "value")
    // three arbitrary disjoint splits by hash of the value
    Seq(2, 3, 5).foreach { m =>
      val parts = (0 until m).map(i =>
        operators.IncrementalRollup.state(
          df.filter(abs(hash(col("value"))) % m === i), keys, "value"))
      val merged = parts.reduce((a, b) => operators.IncrementalRollup.merge(a, b, keys))
      assert(fin(merged) == fin(full), s"split into $m shards diverged")
    }
  }

  test("joinViewDelta: merged state == full rejoin for ANY two-sided split (bulk)") {
    // Random L (key→group) and R (key→value) tables, arbitrarily split
    // into old/delta on EACH side: merge(state(Lold⋈Rold), state(ΔV))
    // must equal state((Lold∪ΔL)⋈(Rold∪ΔR)) — the IVM algebra holds
    // for every split, not just the fixture's.
    val lRows = Gen.listOfN(150, Gen.zip(Gen.chooseNum(0, 40), Gen.chooseNum(0, 7)))
      .sampled.map { case (k, g) => (k.toLong, s"g$g") }
    val rRows = Gen.listOfN(250, Gen.zip(Gen.chooseNum(0, 40), Gen.chooseNum(0, 99999)))
      .sampled.map { case (k, cents) => (k.toLong, cents / 100.0) }
    val l = lRows.toDF("k", "g")
    val r = rRows.toDF("k", "value")
    val keys = Seq("g")
    def fin(st: org.apache.spark.sql.DataFrame) =
      operators.IncrementalRollup.finalize(st, keys).collect().map(_.toSeq).toSet
    val full = operators.IncrementalRollup.state(
      l.join(r, Seq("k")), keys, "value")
    Seq(2, 3, 7).foreach { m =>
      val lsplit = abs(hash(col("g"), col("k"))) % m === 0
      val rsplit = abs(hash(col("value"))) % m === 0
      val (lOld, lDel) = (l.filter(!lsplit), l.filter(lsplit))
      val (rOld, rDel) = (r.filter(!rsplit), r.filter(rsplit))
      val merged = operators.IncrementalRollup.merge(
        operators.IncrementalRollup.state(lOld.join(rOld, Seq("k")), keys, "value"),
        operators.IncrementalRollup.state(
          operators.IncrementalRollup.joinViewDelta(lOld, lDel, rOld, rDel, Seq("k")),
          keys, "value"), keys)
      assert(fin(merged) == fin(full), s"split mod $m diverged")
    }
  }

  test("zorderValue stays within 2*bits bits and is monotone-safe on known orderings (bulk)") {
    val pts = Gen.listOfN(300,
      Gen.zip(Gen.chooseNum(0L, 1023L), Gen.chooseNum(0L, 1023L))).sampled
    val out = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.sinks.Lake.zorderValue(col("x"), col("y"), 10).as("z"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (x, y, z) =>
      assert(z >= 0 && z < (1L << 20), s"z out of range for ($x,$y): $z")
      // decode must invert encode: bit i of x == bit 2i of z, etc.
      val xd = (0 until 10).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val yd = (0 until 10).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert(xd == x && yd == y, s"z-decode mismatch ($x,$y) -> $z -> ($xd,$yd)")
    }
  }

  test("fuzzyMatch recalls every single-char deletion of a catalog name (len >= 5, bulk)") {
    val catalog = Seq("small ring", "red widget", "blue bolt", "hot gear",
      "green gizmo", "steel plate").toDF("name")
    // every deletion position of every name
    val dirty = Seq("small ring", "red widget", "blue bolt", "hot gear",
      "green gizmo", "steel plate")
      .flatMap(n => (0 until n.length).map(p => n.substring(0, p) + n.substring(p + 1)))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "sucio")
    val matched = operators.Dedup.fuzzyMatch(dirty, catalog, "id", "sucio", "name", 2)
    // blocking (prefix-2 ∪ suffix-2) must never lose a single-edit variant
    assert(matched.count() == dirty.count(),
      "every single-deletion variant must find a match within dist 2")
    assert(matched.filter(col("dist") > 1).count() == 0,
      "a single deletion is at distance 1 from its source")
  }

  test("tableDigest: distinct rows give distinct digests under adversarial delimiters (bulk)") {
    val gen = Gen.listOfN(2, Gen.oneOf("|", "V", "N", ":", "a", "b", ""))
      .map(_.mkString)
    val rows = Gen.listOfN(300, Gen.zip(gen, gen)).sampled.distinct
    val df = rows.toDF("p", "q")
    val perRow = df.distinct().collect().length
    // digest the whole table once per row is overkill; instead digest
    // each row as its own 1-row table and compare digest distinctness
    val digests = operators.Quality.tableDigest(
        df.distinct(), Seq("p", "q"), groupBy = Seq("p", "q"))
      .select(col("digest")).distinct().count()
    // distinct (p,q) pairs may share a digest only by 2^-60 accident
    assert(digests == perRow.toLong,
      "prefix-free canon must separate all adversarial delimiter rows")
  }

  test("scd2 merge conserves keys and open-row uniqueness under random update batches") {
    val d1 = java.sql.Date.valueOf("2024-06-01")
    val base = (0L until 40L).map(k => (k, s"v$k")).toDF("k", "v")
      .withColumn("valid_from", lit(java.sql.Date.valueOf("2024-01-01")))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
    val updates = Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 60L), Gen.alphaStr.map(_.take(4))))
      .sampled.distinct.groupBy(_._1).map(_._2.head).toSeq // unique per key
      .toDF("k", "v")
    val merged = operators.Scd2.merge(base, updates, "k", Seq("v"), d1)
    // exactly one OPEN row per key, for every key ever seen
    val openPerKey = merged.filter(col("is_current")).groupBy(col("k")).count()
    assert(openPerKey.filter(col("count") =!= 1).count() == 0)
    val allKeys = base.select("k").union(updates.select("k")).distinct().count()
    assert(openPerKey.count() == allKeys)
    // closed rows only ever gain valid_to = batch date
    assert(merged.filter(!col("is_current") && col("valid_to").isNull).count() == 0)
  }

  test("pageRank conserves total mass on random dangle-free graphs") {
    // Out-edges from EVERY node (a random function graph plus its
    // reversal's targets all have out-degree >= 1) ⇒ Σ rank = 1 up to
    // per-node rounding (n · 1e-6 final-round slack).
    for (_ <- 1 to 5) {
      val n = 30
      val tgt = Gen.listOfN(n, Gen.chooseNum(0, n - 1)).sampled
      val edges = tgt.zipWithIndex.flatMap { case (t, i) =>
        // i → t plus t → i: both endpoints keep an out-edge, no dangling
        Seq((i.toLong, t.toLong), (t.toLong, i.toLong))
      }.filter { case (a, b) => a != b }.distinct
      whenever(edges.nonEmpty) {
        val pr = operators.Graph.pageRank(edges.toDF("s", "t"), "s", "t", 6)
          .agg(sum(col("pagerank"))).head.getDouble(0)
        assert(math.abs(pr - 1.0) < n * 1e-5, s"mass $pr drifted from 1")
      }
    }
  }

  test("triangleStats agrees with brute-force counting on random graphs") {
    for (_ <- 1 to 5) {
      val n = 14
      val pairs = (for { a <- 0 until n; b <- a + 1 until n } yield (a, b))
      val mask = Gen.listOfN(pairs.length, Gen.chooseNum(0, 3)).sampled
      val und = pairs.zip(mask).collect { case (p, 0) => p }
      whenever(und.nonEmpty) {
        val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        val brute = (for {
          a <- 0 until n; b <- a + 1 until n; c <- b + 1 until n
          if adj.getOrElse(a, Set()).contains(b) &&
             adj.getOrElse(a, Set()).contains(c) &&
             adj.getOrElse(b, Set()).contains(c)
        } yield 1).sum
        val out = operators.Graph.triangleStats(
          und.map { case (a, b) => (a.toLong, b.toLong) }.toDF("s", "t"),
          "s", "t")
          .agg(sum(col("n_triangles"))).head
        val total = if (out.isNullAt(0)) 0L else out.getLong(0)
        assert(total == 3L * brute,
          s"per-node triangle total $total != 3 x $brute")
      }
    }
  }

  test("kmvSetOverlap is EXACT set algebra whenever the union fits under k") {
    for (_ <- 1 to 5) {
      val xs = Gen.listOfN(40, Gen.chooseNum(1L, 30L)).sampled.toSet
      val ys = Gen.listOfN(40, Gen.chooseNum(15L, 45L)).sampled.toSet
      whenever(xs.nonEmpty && ys.nonEmpty) {
        // |A∪B| <= 45 < k=64 ⇒ estimates must equal the true algebra
        val rows = (xs.map(("a", _)) ++ ys.map(("b", _))).toSeq.toDF("s", "h")
        val r = operators.EventOps.kmvSetOverlap(rows, "s", "h", 64)
          .collect().head
        assert(r.getDouble(2) == (xs ++ ys).size.toDouble)
        val j = BigDecimal((xs & ys).size.toDouble / (xs ++ ys).size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(3) == j)
      }
    }
  }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body
}
