package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Option(10.0), "A"),
    (2L, Option(-5.0), "A"),   // range violation
    (3L, Option.empty[Double], "B"), // null violation
    (3L, Option(7.0), "Z"),    // dupe key + unknown flag
  ).toDF("id", "v", "flag")

  test("check: all row-wise rules in one pass, long-form report") {
    val out = Quality.check(df, Seq(
      Quality.Expectation("v_null", col("v").isNull),
      Quality.Expectation("v_negative", col("v") < 0),
      Quality.Expectation("flag_unknown", !col("flag").isin("A", "B"))))
      .as[(String, Long)].collect().toMap
    assert(out == Map("v_null" -> 1L, "v_negative" -> 1L, "flag_unknown" -> 1L))
    // one scan: exactly one aggregate over the source, no joins
    val plan = Quality.check(df, Seq(Quality.Expectation("x", col("v").isNull)))
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.Join
    assert(plan.collect { case j: Join => j }.isEmpty, "check must not join")
  }

  test("uniqueness counts rows beyond the first per key") {
    val out = Quality.uniqueness(df, Seq("id"), "id_dupes")
      .as[(String, Long)].collect().toSeq
    assert(out == Seq("id_dupes" -> 1L))
  }

  test("tableDigest is row-order and partitioning independent, and detects a changed row") {
    val cols = Seq("id", "flag")
    val a = Quality.tableDigest(df, cols).as[(Long, Long, Long)].head()
    val b = Quality.tableDigest(df.orderBy(col("flag").desc).repartition(7), cols)
      .as[(Long, Long, Long)].head()
    assert(a == b, "digest must be invariant to order and partitioning")
    val mutated = df.withColumn("flag",
      when(col("id") === 2L, lit("MUTATED")).otherwise(col("flag")))
    val c = Quality.tableDigest(mutated, cols).as[(Long, Long, Long)].head()
    assert(c._1 != a._1 && c._2 != a._2 && c._3 == a._3,
      "same count, different digests")
  }

  test("tableDigest: delimiter inside values cannot shift across column boundaries") {
    // ("x|V1:y", "z") vs ("x", "y|V1:z") — without length prefixes both
    // canonicalize identically; the digest must distinguish them.
    val a = Seq((1L, "x|V1:y", "z")).toDF("id", "p", "q")
    val b = Seq((1L, "x", "y|V1:z")).toDF("id", "p", "q")
    val da = Quality.tableDigest(a, Seq("p", "q")).as[(Long, Long, Long)].head()
    val db = Quality.tableDigest(b, Seq("p", "q")).as[(Long, Long, Long)].head()
    assert(da._1 != db._1, "length-prefixed canon must be prefix-free")
  }

  test("tableDigest: even-multiplicity duplicates do not xor-cancel into a false equal") {
    // {A,A} vs {B,B}: both xor to 0 at equal n_rows — the sum fold must
    // tell them apart (the duplicate-shuffling migration bug).
    val aa = Seq((1L, "A"), (1L, "A")).toDF("id", "s")
    val bb = Seq((2L, "B"), (2L, "B")).toDF("id", "s")
    val daa = Quality.tableDigest(aa, Seq("id", "s")).as[(Long, Long, Long)].head()
    val dbb = Quality.tableDigest(bb, Seq("id", "s")).as[(Long, Long, Long)].head()
    assert(daa._1 == 0L && dbb._1 == 0L && daa._3 == dbb._3,
      "precondition: xor digests cancel at equal counts")
    assert(daa._2 != dbb._2, "sum digest must distinguish duplicate sets")
    // and one-vs-two copies of the same row at different counts is the
    // easy case, but the sum must also shift: digest_sum(A) != digest_sum(A,A)
    val a1 = Quality.tableDigest(aa.limit(1), Seq("id", "s")).as[(Long, Long, Long)].head()
    assert(a1._2 != daa._2)
  }

  test("madOutliers: constant groups abstain; a gross outlier is flagged; inliers are not") {
    val rows = Seq.tabulate(20)(i => ("g", 10.0 + (i % 5))) ++  // tight cluster
      Seq(("g", 1000.0)) ++                                      // gross outlier
      Seq.tabulate(10)(_ => ("const", 7.0))                      // MAD = 0 group
    val df = rows.toDF("grp", "v")
    val out = Quality.madOutliers(df, "grp", "v", 4.0)
      .select($"grp", $"v").as[(String, Double)].collect().toSet
    assert(out == Set(("g", 1000.0)))
  }

  test("madOutliers has no forced broadcast: high-cardinality keys fall back to shuffled joins") {
    // With the old broadcast() hints the stats sides were broadcast
    // REGARDLESS of size (hints override autoBroadcastJoinThreshold) —
    // a driver OOM for user_id-grade group keys. Proof the hint is
    // gone: with the threshold disabled, no broadcast join may appear.
    val wide = spark.range(100000)
      .select(col("id").as("grp"), (col("id") % 13).cast("double").as("v"))
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val out = Quality.madOutliers(wide.toDF(), "grp", "v", 3.0)
      out.collect() // materialize so AQE finalizes the physical plan
      val physical = out.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastHashJoin") &&
        !physical.contains("BroadcastExchange"),
        s"stats joins must fall back to shuffled joins when broadcast is off:\n$physical")
    } finally spark.conf.set(key, prev)
  }

  test("madOutliers threshold is monotone: higher k flags a subset") {
    val df = (Seq.tabulate(50)(i => 10.0 + i % 7) ++ Seq(80.0, 200.0, 1000.0))
      .map(("g", _)).toDF("grp", "v")
    val at3 = Quality.madOutliers(df, "grp", "v", 3.0).count()
    val at10 = Quality.madOutliers(df, "grp", "v", 10.0).count()
    assert(at10 <= at3 && at10 >= 1)
  }

  test("tableDigest: null never collides with any string value (N/V tagging)") {
    val withNull = Seq((1L, Option.empty[String])).toDF("id", "s")
    (Seq("N", "null", "", "Nnull") :+ "V").foreach { v =>
      val withVal = Seq((1L, Option(v))).toDF("id", "s")
      val dn = Quality.tableDigest(withNull, Seq("id", "s")).as[(Long, Long, Long)].head()
      val dv = Quality.tableDigest(withVal, Seq("id", "s")).as[(Long, Long, Long)].head()
      assert(dn._1 != dv._1, s"null must not collide with '$v'")
    }
  }

  test("psiDrift: identical halves score 0; a shifted distribution crosses the action threshold") {
    import org.apache.spark.sql.functions.col
    // 'stable': current ≡ baseline (same 200 values) → smoothed PSI exactly 0.
    // 'shifted': baseline uniform on [0,100), current on [100,200) → disjoint
    // bins, PSI far above the 0.25 action threshold.
    val rows =
      (0 until 200).map(i => ("stable", (i % 100) + 0.5, i < 100)) ++
      (0 until 200).map(i => ("shifted", (i % 100) + (if (i < 100) 0.5 else 100.5), i < 100))
    val df = rows.toDF("grp", "value", "is_base")
    val psi = Quality.psiDrift(df, "grp", "value", col("is_base"), 10.0)
      .as[(String, Double)].collect().toMap
    assert(psi("stable") == 0.0, s"identical halves must score exactly 0, got ${psi("stable")}")
    assert(psi("shifted") > 0.25, s"disjoint shift must cross 0.25, got ${psi("shifted")}")
    // monotone sanity: a PARTIAL shift lands between the two
    val partial = (0 until 200).map(i =>
      ("p", (i % 100) + (if (i < 100) 0.5 else if (i % 2 == 0) 100.5 else 0.5), i < 100))
    val pp = Quality.psiDrift(partial.toDF("grp", "value", "is_base"), "grp", "value",
      col("is_base"), 10.0).as[(String, Double)].collect().head._2
    assert(pp > 0.0 && pp < psi("shifted"))
  }

  test("quantileNormalize: exact empirical CDF when the group fits in k") {
    // 50 rows, k = 256 → the sample IS the group: pct_rank(v) must be
    // exactly rank(v)/n, including tie semantics (count of values <= v).
    val rows = (1 to 50).map(i => (i.toLong, "a", (i % 10).toDouble))
      .toDF("id", "src", "score")
    val got = Quality.quantileNormalize(rows, "src", "id", "score", 256)
      .as[(String, Long, Double, Double)].collect()
    assert(got.length == 50)
    got.foreach { case (_, _, v, r) =>
      val exact = (1 to 50).count(i => (i % 10).toDouble <= v) / 50.0
      assert(math.abs(r - exact) < 1e-9, s"v=$v rank $r != exact $exact")
    }
    // sampled path: estimates within O(1/sqrt(k)) of the true CDF
    val big = (1 to 20000).map(i => (i.toLong, "b", (i % 1000).toDouble))
      .toDF("id", "src", "score")
    Quality.quantileNormalize(big, "src", "id", "score", 256)
      .as[(String, Long, Double, Double)].collect().foreach { case (_, _, v, r) =>
        assert(math.abs(r - (v + 1) / 1000.0) < 0.15, s"v=$v rank=$r")
      }
  }

  test("ksDrift: identical halves stay near 0; a planted shift is detected; KS in [0,1]") {
    // stationary: both halves the same ramp → sample-level KS near 0
    val same = (0 until 2000).map(i => (i.toLong, "s", (i % 500).toDouble, i % 2 == 0))
    // planted: current half shifted by +250 of a 500 range → true KS 0.5
    val shifted = (0 until 2000).map(i =>
      (10000L + i, "d", (i % 500) + (if (i % 2 == 0) 0.0 else 250.0), i % 2 == 0))
    val ks = Quality.ksDrift((same ++ shifted).toDF("id", "grp", "value", "is_base"),
        "grp", "id", "value", col("is_base"), 256)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val (sa, sb, sKs) = ks("s")
    assert(sa == 256L && sb == 256L, "both sides must cap at k")
    assert(sKs < 0.15, s"stationary KS should be near 0, got $sKs")
    val dKs = ks("d")._3
    assert(dKs > 0.3 && dKs <= 1.0, s"planted 0.5-shift missed: $dKs")
    assert(dKs > sKs, "shifted must exceed stationary")
  }

  test("benford: log-uniform data conforms, template-stamped data is flagged, missing digits fold in") {
    import spark.implicits._
    // "natural": first digits drawn to match Benford frequencies
    // exactly in a 1000-row sample (round(1000·p_d) per digit).
    val natural = graft.operators.Quality.benfordExpected.flatMap { case (d, p) =>
      Seq.fill(math.round(1000 * p).toInt)(d.toLong * 1000L) // d as first digit
    }.zipWithIndex.map { case (v, i) => ("nat", v + i % 100) } // jitter tails, not first digits
    // "stamped": every length is 500-something — first digit always 5
    val stamped = (1 to 1000).map(i => ("gen", 500L + i % 90))
    val df = (natural ++ stamped).toDF("src", "len")
    val out = graft.operators.Quality.benford(df, "src", "len")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val (nNat, chiNat) = out("nat")
    val (nGen, chiGen) = out("gen")
    assert(nNat > 990 && nGen == 1000)
    assert(chiNat < 20, s"Benford-conforming sample must score low: $chiNat")
    // single-digit data: Σ_obs term + folded missing mass ⇒ huge χ²
    assert(chiGen > 1000, s"template-stamped data must be flagged: $chiGen")
    assert(chiGen > 50 * chiNat)
    // zero/negative values are excluded, not crashed on; fractions
    // without an integer part are excluded by the same predicate
    val withJunk = df.withColumn("len", $"len".cast("double"))
      .union(Seq(("nat", 0.0), ("nat", -3.0), ("nat", 0.4)).toDF("src", "len"))
    val out2 = graft.operators.Quality.benford(withJunk, "src", "len")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out2("nat") == nNat, "non-positive and sub-1 values must not count")
  }
  test("equidepthBins: exact quartile splits when the group fits in k; nulls and guards") {
    // 8 values 1..8, ids unique: sketch = the full multiset, so the
    // thresholds are exact type-1 quartiles t = (2, 4, 6) and the four
    // buckets hold exactly two values each.
    val df = ((1 to 8).map(i => ("g", i.toLong, Option(i.toDouble))) :+
      (("g", 99L, Option.empty[Double])))            // null value: excluded
      .toDF("grp", "id", "v")
    val out = graft.operators.Quality.equidepthBins(df, "grp", "id", "v",
      Seq(0.25, 0.5, 0.75), 256)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out == Map(
      ("g", 0) -> ((2L, 1.0, 2.0)),
      ("g", 1) -> ((2L, 3.0, 4.0)),
      ("g", 2) -> ((2L, 5.0, 6.0)),
      ("g", 3) -> ((2L, 7.0, 8.0))))
    val e = intercept[IllegalArgumentException] {
      graft.operators.Quality.equidepthBins(df, "grp", "id", "v", Seq(0.5, 0.25))
    }
    assert(e.getMessage.contains("sorted"))
  }

  test("ewmaControl: closed form equals the textbook recurrence; sigma units; alpha guard") {
    // Two types: "a" has a volume spike on day 4; "b" is flat (σ = 0 →
    // dev_sigma must be 0, not NaN/null). Counts per (type, day):
    //   a: 3, 1, 2, 10    b: 2, 2, 2
    val rows = Seq("a" -> Seq(3, 1, 2, 10), "b" -> Seq(2, 2, 2)).flatMap {
      case (t, counts) => counts.zipWithIndex.flatMap { case (n, day) =>
        (0 until n).map(i =>
          (t, java.sql.Timestamp.valueOf(f"2024-03-${day + 1}%02d 0$i:30:00")))
      }
    }.toDF("event_type", "ts")
    val out = Quality.ewmaControl(rows, "event_type", "ts", alpha = 0.3)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap

    def recurrence(xs: Seq[Int], alpha: Double): Seq[Double] =
      xs.tail.scanLeft(xs.head.toDouble)((e, x) => alpha * x + (1 - alpha) * e)
    def sigmaPop(xs: Seq[Int]): Double = {
      val mu = xs.sum.toDouble / xs.length
      math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / xs.length)
    }
    Seq("a" -> Seq(3, 1, 2, 10), "b" -> Seq(2, 2, 2)).foreach { case (t, xs) =>
      val ew = recurrence(xs, 0.3)
      val sg = sigmaPop(xs)
      xs.indices.foreach { i =>
        val (x, ewma, dev) = out((t, f"2024-03-${i + 1}%02d"))
        assert(x == xs(i).toLong)
        assert(math.abs(ewma - ew(i)) < 1e-6,
          s"ewma($t, day ${i + 1}): got $ewma want ${ew(i)}")
        val want = if (sg > 0) math.abs(xs(i) - ew(i)) / sg else 0.0
        assert(math.abs(dev - want) < 1e-6, s"dev_sigma($t, day ${i + 1})")
      }
    }
    // the flat series must sit exactly on its own level
    assert(out(("b", "2024-03-03"))._2 == 2.0 && out(("b", "2024-03-03"))._3 == 0.0)
    val e2 = intercept[IllegalArgumentException] {
      Quality.ewmaControl(rows, "event_type", "ts", alpha = 1.0)
    }
    assert(e2.getMessage.contains("alpha"))
  }

  test("trainLogistic: planted spam scores below planted prose; training is deterministic") {
    // Features mimic tx42's: token-mass share per hash bucket + bias.
    // Spam = all mass in one bucket (repetitive); prose = spread mass.
    // 60 labeled docs, 3 buckets for a clean signal.
    val rows = (0 until 60).map { i =>
      val spam = i % 2 == 0
      if (spam) (i.toLong, 0.0, 1.0, 0.0, 0.0, 1.0)          // y=0, mass in x0
      else      (i.toLong, 1.0, 0.2, 0.4, 0.4, 1.0)          // y=1, spread
    }.toDF("id", "y", "x0", "x1", "x2", "xb")
    val cols = Seq("x0", "x1", "x2", "xb")
    val w = Quality.trainLogistic(rows, "y", cols, rounds = 8, lr = 1.0)
    val scored = rows.select($"id", $"y",
        Quality.logisticScore(w, cols).as("s"))
      .as[(Long, Double, Double)].collect()
    val spamMax = scored.filter(_._2 == 0.0).map(_._3).max
    val proseMin = scored.filter(_._2 == 1.0).map(_._3).min
    assert(spamMax < proseMin,
      s"every planted spam doc ($spamMax) must score below every prose doc ($proseMin)")
    // determinism: same data re-partitioned differently → identical weights
    val w2 = Quality.trainLogistic(rows.repartition(13), "y", cols, 8, 1.0)
    assert(w.toSeq == w2.toSeq, "training must not depend on physical layout")
    intercept[IllegalArgumentException] { Quality.trainLogistic(rows, "y", cols, 0, 1.0) }
    intercept[IllegalArgumentException] { Quality.trainLogistic(rows, "y", Nil, 1, 1.0) }
  }

  test("trainLogistic: scaled-integer gradients are layout-invariant (dq10 red-test sweep)") {
    // The round-17 rewrite's guarantee: gradient aggregation is an
    // EXACT integer sum, so any partition layout produces bit-identical
    // trajectories even on boundary-adjacent data. Features are dense
    // irrational-ish values (the adversarial class for the old
    // round(avg) form, whose addend order was layout-dependent).
    val rows = (0 until 500).map { i =>
      (i.toLong, (i % 2).toDouble,
        math.rint(math.sin(i.toDouble) * 1e6) / 1e6,
        math.rint(math.cos(i * 0.7) * 1e6) / 1e6, 1.0)
    }.toDF("id", "y", "x0", "x1", "xb")
    val cols = Seq("x0", "x1", "xb")
    val base = Quality.trainLogistic(rows, "y", cols, rounds = 6, lr = 0.5).toSeq
    for (p <- Seq(1, 7, 13, 32)) {
      val wp = Quality.trainLogistic(rows.repartition(p), "y", cols, 6, 0.5).toSeq
      assert(wp == base, s"weights diverged at $p partitions")
    }
  }

  test("trainLogistic fails loudly on empty frames and null features/labels") {
    // the round-14 ADVICE finding: an empty frame or a null feature
    // used to surface as an opaque NPE from Row.getDouble mid-training
    val rows = Seq((1.0, 0.5, 1.0), (0.0, 0.2, 1.0)).toDF("y", "x0", "xb")
    val cols = Seq("x0", "xb")
    val empty = intercept[IllegalArgumentException] {
      Quality.trainLogistic(rows.filter($"y" > 9), "y", cols, 1, 1.0)
    }
    assert(empty.getMessage.contains("empty"), empty.getMessage)
    val withNullFeat = Seq((1.0, Some(0.5), 1.0), (0.0, None, 1.0))
      .toDF("y", "x0", "xb")
    val nf = intercept[IllegalArgumentException] {
      Quality.trainLogistic(withNullFeat, "y", cols, 1, 1.0)
    }
    assert(nf.getMessage.contains("x0"), nf.getMessage)
    val withNullLabel = Seq((Some(1.0), 0.5, 1.0), (None, 0.2, 1.0))
      .toDF("y", "x0", "xb")
    val nl = intercept[IllegalArgumentException] {
      Quality.trainLogistic(withNullLabel, "y", cols, 1, 1.0)
    }
    assert(nl.getMessage.contains("y"), nl.getMessage)
  }
}
