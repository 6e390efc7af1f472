package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = (1 to 2000).map(i =>
    (i.toLong, Seq("en", "es", "de", "zh")(i % 4))).toDF("id", "lang")

  test("rate 1.0 keeps exactly one copy of every row") {
    val out = Sampling.stratifiedMix(fixture, "id", "lang", Map.empty, 1.0)
    assert(out.count() == 2000)
    assert(out.agg(max($"epoch"), min($"epoch")).as[(Int, Int)].head() == ((1, 1)))
  }

  test("rate 0 drops the stratum entirely; fractional rates downsample") {
    val out = Sampling.stratifiedMix(fixture, "id", "lang",
      Map("en" -> 0.0, "es" -> 0.5), 1.0)
    assert(out.filter($"lang" === "en").count() == 0)
    val es = out.filter($"lang" === "es").count().toDouble
    val esTotal = fixture.filter($"lang" === "es").count().toDouble
    assert(es / esTotal > 0.3 && es / esTotal < 0.7, s"es kept ${es / esTotal}")
  }

  test("rates above 1 materialize floor/ceil epoch copies per row") {
    val out = Sampling.stratifiedMix(fixture, "id", "lang", Map("de" -> 2.5), 0.0)
    val perRow = out.groupBy($"id").agg(count(lit(1)).as("c"), max($"epoch").as("m"))
      .select($"c".cast("long"), $"m".cast("long")).as[(Long, Long)].collect()
    assert(perRow.nonEmpty)
    assert(perRow.forall { case (c, m) => (c == 2L || c == 3L) && m == c })
    val mean = perRow.map(_._1).sum.toDouble / perRow.length
    assert(mean > 2.3 && mean < 2.7, s"mean copies $mean")
  }

  test("the decision is a pure function of the id — partitioning-invariant") {
    val a = Sampling.stratifiedMix(fixture, "id", "lang", Map("en" -> 0.5), 1.0)
      .select($"id", $"epoch").as[(Long, Int)].collect().sorted.toSeq
    val b = Sampling.stratifiedMix(fixture.repartition(13), "id", "lang",
      Map("en" -> 0.5), 1.0)
      .select($"id", $"epoch").as[(Long, Int)].collect().sorted.toSeq
    assert(a == b)
  }

  test("negative rates are rejected at plan time") {
    intercept[IllegalArgumentException] {
      Sampling.stratifiedMix(fixture, "id", "lang", Map("en" -> -0.1), 1.0)
    }
  }

  test("temperatureMix: α=1 is the identity mix, α<1 flattens toward uniform") {
    // zipfian-ish skew: en 1400, es 400, de 150, zh 50
    val skewed = (1 to 2000).map { i =>
      val lang = if (i <= 1400) "en" else if (i <= 1800) "es"
                 else if (i <= 1950) "de" else "zh"
      (i.toLong, lang)
    }.toDF("id", "lang")

    // α = 1 ⇒ rate_s = 1 for every stratum: each row appears exactly once
    val id1 = Sampling.temperatureMix(skewed, "id", "lang", 1.0)
    assert(id1.groupBy($"id").count().filter($"count" =!= 1).count() == 0)
    assert(id1.count() == skewed.count())

    // α = 0.5 ⇒ the head stratum's output share shrinks toward uniform,
    // the tail's grows; expected total stays ≈ N
    def share(df: org.apache.spark.sql.DataFrame, lang: String): Double =
      df.filter($"lang" === lang).count().toDouble / df.count()
    val mixed = Sampling.temperatureMix(skewed, "id", "lang", 0.5)
    assert(share(mixed, "en") < share(skewed, "en"),
      "head stratum en must be downsampled")
    assert(share(mixed, "zh") > share(skewed, "zh"),
      "tail stratum zh must be upsampled")
    val n = skewed.count().toDouble
    assert(math.abs(mixed.count() - n) / n < 0.15,
      s"expected output size ≈ N, got ${mixed.count()} vs $n")

    // deterministic: same plan twice, same rows
    assert(mixed.select($"id", $"epoch").as[(Long, Int)].collect().sorted.toSeq ==
      Sampling.temperatureMix(skewed, "id", "lang", 0.5)
        .select($"id", $"epoch").as[(Long, Int)].collect().sorted.toSeq)
  }

  test("tokenBudgetMix: full budget keeps everything; smaller budgets select deterministic subsets") {
    val docs = (1 to 1200).map { i =>
      (i.toLong, if (i % 3 == 0) "big" else "small", 10L + (i % 7))
    }.toDF("id", "src", "tk")
    // budgetFrac=1, α=1 ⇒ every source's rate is exactly 1 ⇒ identity
    val all = Sampling.tokenBudgetMix(docs, "id", "src", $"tk", 1.0, 1.0)
    assert(all.count() == 1200)
    assert(all.agg(min($"__rate")).as[Double].head() == 1.0)

    val half = Sampling.tokenBudgetMix(docs, "id", "src", $"tk", 0.5, 0.5)
    val n = half.count()
    assert(n > 0 && n < 1200, s"half budget must select a strict subset, got $n")
    // realized tokens land near the budget (hash threshold is exact in
    // expectation; fixture rates are far from 0/1 so ±15% is generous)
    val totTk = docs.agg(sum($"tk")).as[Long].head().toDouble
    val gotTk = half.agg(sum($"tk")).as[Long].head().toDouble
    assert(math.abs(gotTk / totTk - 0.5) < 0.15,
      s"realized token share ${gotTk / totTk} should be ≈ 0.5")
    // pure function of the id — rerun equality
    assert(half.select($"id").as[Long].collect().sorted.toSeq ==
      Sampling.tokenBudgetMix(docs, "id", "src", $"tk", 0.5, 0.5)
        .select($"id").as[Long].collect().sorted.toSeq)
  }

  test("waterfillRates: no saturation ⇒ the plain temperature rates; budget hit exactly") {
    val toks = Seq("a" -> 4000.0, "b" -> 4000.0, "c" -> 2000.0)
    val r = Sampling.waterfillRates(toks, 0.5, 1.0)
    // α=1: every rate equals budgetFrac
    assert(r.values.forall(v => math.abs(v - 0.5) < 1e-12))
    val realized = toks.map { case (s, t) => r(s) * t }.sum
    assert(math.abs(realized - 0.5 * 10000.0) < 1e-6)
  }

  test("waterfillRates: saturated source caps at 1.0 and its surplus is re-allocated") {
    // α=0 allocates the budget EQUALLY (1000 each) — the tiny source
    // can only supply 10, so the one-pass clamp would undershoot by
    // 990; waterfilling moves that surplus to the big sources.
    val toks = Seq("tiny" -> 10.0, "big1" -> 5000.0, "big2" -> 5000.0)
    val budgetFrac = 3000.0 / 10010.0
    val r = Sampling.waterfillRates(toks, budgetFrac, 0.0)
    assert(r("tiny") == 1.0)
    assert(math.abs(r("big1") - 2990.0 / 10000.0) < 1e-9)
    val realized = toks.map { case (s, t) => r(s) * t }.sum
    assert(math.abs(realized - 3000.0) < 1e-6,
      s"waterfilled budget must be exact, realized $realized")
    // the clamp-only rule demonstrably undershoots the same config
    val clampRealized = toks.map { case (_, t) =>
      math.min(1.0, (budgetFrac * 10010.0 / 3) / t) * t }.sum
    assert(clampRealized < 2100.0, s"clamp undershoots: $clampRealized")
  }

  test("waterfillRates: budget above the corpus ⇒ every rate is 1; zero-token strata get 0") {
    val r = Sampling.waterfillRates(Seq("a" -> 100.0, "b" -> 0.0), 2.0, 0.7)
    assert(r("a") == 1.0 && r("b") == 0.0)
  }

  test("tokenBudgetMix waterfill=true realizes the budget where the clamp undershoots") {
    // one tiny source + two big ones, α=0 (equal split): the clamp
    // loses the tiny source's unfillable share; waterfill recovers it.
    val docs = ((1 to 10).map(i => (i.toLong, "tiny", 10L)) ++
      (11 to 1010).map(i => (i.toLong, "big1", 10L)) ++
      (1011 to 2010).map(i => (i.toLong, "big2", 10L))).toDF("id", "src", "tk")
    val totTk = 20100.0
    val budgetFrac = 0.3
    val clamped = Sampling.tokenBudgetMix(docs, "id", "src", $"tk", budgetFrac, 0.0)
      .agg(sum($"tk")).as[Long].head().toDouble / totTk
    val filled = Sampling.tokenBudgetMix(docs, "id", "src", $"tk", budgetFrac, 0.0,
      waterfill = true).agg(sum($"tk")).as[Long].head().toDouble / totTk
    assert(clamped < 0.24, s"clamp should undershoot 0.3, got $clamped")
    assert(math.abs(filled - budgetFrac) < 0.04,
      s"waterfill should realize ≈ $budgetFrac, got $filled")
  }

  test("weightedSample: selection equals the A-Res formula computed independently") {
    def key(id: Long, w: Double): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / math.pow(2, 60)
      BigDecimal(math.log(u) / w)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val rows = (1L to 50L).map(i => (i, "s", 1.0 + (i % 3)))
    val expected = rows.map { case (i, _, w) => (key(i, w), i) }
      .sortBy { case (k, i) => (-k, i) }.take(8).map(_._2).toSet
    val df = rows.toDF("id", "src", "w")
    val got = Sampling.weightedSample(df, "id", "src", $"w", 8)
      .select($"id").as[Long].collect().toSet
    assert(got == expected, s"operator picked $got, formula says $expected")
    // deterministic rerun
    assert(Sampling.weightedSample(df, "id", "src", $"w", 8)
      .select($"id").as[Long].collect().toSet == got)
  }

  test("weightedSample: an overwhelming weight is always drawn first; k caps per stratum") {
    val df = ((1L to 30L).map(i => (i, "a", 1.0)) :+ (99L, "a", 1e9))
      .toDF("id", "src", "w")
    val out = Sampling.weightedSample(df, "id", "src", $"w", 5)
      .orderBy($"rnk").as[(String, Long, Long, Double)].collect()
    assert(out.length == 5)
    assert(out.head._3 == 99L, "1e9-weight row must rank first")
  }

  test("weightedSample: zero or negative weights raise instead of silently inverting") {
    // A negative weight flips ln(u)/w positive — those rows would sort
    // FIRST (the opposite of weight-proportional); w = 0 is ±Inf/NaN.
    // The key projection must fail loudly on either.
    val df = Seq((1L, "a", 2.0), (2L, "a", -1.0)).toDF("id", "src", "w")
    val e = intercept[Exception] {
      Sampling.weightedSample(df, "id", "src", $"w", 5).collect()
    }
    assert(e.getMessage.contains("strictly positive"), e.getMessage)
    val z = Seq((1L, "a", 0.0)).toDF("id", "src", "w")
    val e2 = intercept[Exception] {
      Sampling.weightedSample(z, "id", "src", $"w", 5).collect()
    }
    assert(e2.getMessage.contains("strictly positive"), e2.getMessage)
  }

  test("tokenBudgetMix waterfill=true: an all-null token stratum drops instead of NPEing") {
    val docs = ((1 to 100).map(i => (i.toLong, "a", Some(10L))) ++
      (101 to 120).map(i => (i.toLong, "b", Option.empty[Long])))
      .toDF("id", "src", "tk")
    val out = Sampling.tokenBudgetMix(docs, "id", "src", $"tk", 0.5, 1.0,
      waterfill = true)
    assert(out.filter($"src" === "b").count() == 0, "null-sum stratum gets no budget")
    assert(out.filter($"src" === "a").count() > 0)
  }

  test("tokenBudgetMix waterfill=true keeps non-string strata types and drops null strata") {
    // LONG-typed strata above 2^53 (where a string↔double coercion
    // would silently mismatch) plus a null stratum: the rates frame
    // must carry the ORIGINAL key type and null-strata rows must drop
    // exactly as the equi-join drops them on the one-pass path.
    val big1 = (1L << 53) + 1L
    val big2 = (1L << 53) + 2L // rounds to the same double as big1
    val docs = ((1 to 500).map(i => (i.toLong, Some(big1), 10L)) ++
      (501 to 1000).map(i => (i.toLong, Some(big2), 10L)) ++
      (1001 to 1010).map(i => (i.toLong, Option.empty[Long], 10L)))
      .toDF("id", "src", "tk")
    val out = Sampling.tokenBudgetMix(docs, "id", "src", $"tk", 0.5, 1.0,
      waterfill = true)
    assert(out.schema("src").dataType ==
      org.apache.spark.sql.types.LongType)
    val bySrc = out.groupBy($"src").count().as[(Option[Long], Long)]
      .collect().toMap
    assert(!bySrc.contains(None), "null strata must be dropped")
    // both distinct long keys survive the join (no double collapse)
    assert(bySrc.contains(Some(big1)) && bySrc.contains(Some(big2)),
      s"both 2^53-adjacent keys must join back, got ${bySrc.keys}")
    Seq(big1, big2).foreach { k =>
      val n = bySrc(Some(k)).toDouble
      assert(math.abs(n / 500.0 - 0.5) < 0.15,
        s"stratum $k keep-rate ≈ 0.5, got ${n / 500.0}")
    }
  }
}
