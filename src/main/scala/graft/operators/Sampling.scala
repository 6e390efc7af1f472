package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mixing for training corpora.
  *
  * Every decision is a pure projection of the row's id (md5 bucket) — no
  * RNG, no state, no shuffle: the same doc gets the same fate on any
  * engine, any run, any partitioning, which is what makes a 100 TB
  * sampling pass reproducible (and oracle-checkable). Complements
  * [[graft.functions.TextAnalysis.deterministicSplit]] (train/val/test)
  * with per-stratum rates and epoch-weighted mixing.
  */
object Sampling {

  /** Uniform deterministic bucket in [0, mod): first 8 md5 hex chars of
    * the stringified id, mod `mod`. */
  def hashBucket(id: Column, mod: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % mod

  /** Copies of a row under rate `r` (mixing weight): floor(r) guaranteed
    * epochs plus one more for the id-bucket fraction `r - floor(r)` of
    * rows — so a stratum with rate 2.5 is upsampled ×2.5 in expectation
    * with EXACTLY floor/ceil copies per row, and rate 0.25 keeps a
    * deterministic quarter. Fractions are fixed to basis points at plan
    * time (integer compare — no per-row float math). */
  private def copiesFor(rate: Double, bucket: Column): Column = {
    require(rate >= 0, s"negative sampling rate: $rate")
    val whole = math.floor(rate).toInt
    val fracBp = math.round((rate - whole) * 10000).toInt
    lit(whole) + when(bucket < fracBp, 1).otherwise(0)
  }

  /** Per-stratum copy count: `rates` maps stratum value → rate (values
    * > 1 upsample, < 1 downsample), unmatched strata get `defaultRate`.
    * Pure codegen'd CASE chain over the (tiny, plan-time) rate map. */
  def mixCopies(id: Column, strata: Column, rates: Map[String, Double],
                defaultRate: Double): Column = {
    val b = hashBucket(id, 10000)
    rates.toSeq.sortBy(_._1).foldRight(copiesFor(defaultRate, b)) {
      case ((k, r), alt) => when(strata === k, copiesFor(r, b)).otherwise(alt)
    }
  }

  /** Epoch-materialized stratified mix — the sampling-weights pass of a
    * training-data pipeline: each row appears `mixCopies` times with an
    * `epoch` column (1..copies). Rows with 0 copies drop out. The
    * explode multiplies rows AFTER all per-row work, so upstream
    * operators see each doc once; `sequence` is guarded (Spark's
    * sequence(1, 0) would count DOWN, not return empty). */
  def stratifiedMix(df: DataFrame, idCol: String, strataCol: String,
                    rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val copies = mixCopies(col(idCol), col(strataCol), rates, defaultRate)
    df.withColumn("__copies", copies)
      .withColumn("epoch",
        explode(when(col("__copies") > 0, sequence(lit(1), col("__copies")))
          .otherwise(typedLit(Seq.empty[Int]))))
      .drop("__copies")
  }

  /** Temperature-scaled source mixing — the pretraining re-balancing
    * rule p_s ∝ n_s^α, with the rates DERIVED from the corpus instead
    * of hand-tuned: `rate_s = n_s^α · N / (Σ n^α · n_s)`, which keeps
    * the expected output size at N while flattening the source
    * distribution for α < 1 (tail sources upsampled, head sources
    * downsampled; α = 1 is the identity mix). Rates are rounded to 6
    * decimals — the rate table is data-derived here, so the rounding is
    * what pins cross-engine float agreement — then applied with
    * [[stratifiedMix]]'s floor/ceil-epoch md5-bucket rule. Cost: one
    * stratum hash agg, a broadcast of the stratum-sized rate table,
    * and the epoch explode; training rows shuffle zero times. */
  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
                     alpha: Double): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n_s"))
    val tot = counts.agg(sum(col("__n_s")).cast("double").as("__n_tot"),
      sum(pow(col("__n_s"), lit(alpha))).as("__pw"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col(strataCol),
        round(pow(col("__n_s"), lit(alpha)) * col("__n_tot") /
          (col("__pw") * col("__n_s")), 6).as("__rate"))
    val b = hashBucket(col(idCol), 10000)
    val copies = floor(col("__rate")).cast("int") +
      when(b < round((col("__rate") - floor(col("__rate"))) * lit(10000)), 1)
        .otherwise(0)
    df.join(broadcast(rates), Seq(strataCol))
      .withColumn("__copies", copies)
      .withColumn("epoch",
        explode(when(col("__copies") > 0, sequence(lit(1), col("__copies")))
          .otherwise(typedLit(Seq.empty[Int]))))
      .drop("__copies", "__rate")
  }

  /** Token-budget mixing — "give me ~B tokens at this mixture": the
    * total token budget is `budgetFrac` of the corpus, allocated per
    * source by the temperature rule (share_s ∝ tokens_s^α), and each
    * source keeps the deterministic id-hash fraction of its docs that
    * meets its allocation (rate_s = min(1, B·tokens_s^(α-1)/Σtokens^α)).
    *
    * No sort, no window: one token-sum agg, a broadcast stratum-sized
    * rate table, and a codegen'd integer hash compare per row — the
    * 100 TB shape (a cumulative-sum cutoff would need a per-source
    * global sort for exact budgets; the hash threshold hits its RATE in
    * expectation). Rates are rounded to 6 decimals (data-derived, so
    * the rounding pins cross-engine float agreement); keeps the
    * `__rate` column for audit. `tokenCount` must be an integral-typed
    * column expression.
    *
    * BUDGET CAVEAT: the rate clamp at 1.0 does NOT redistribute the
    * clipped surplus — whenever a source's temperature allocation
    * exceeds its size (small source, α < 1), the realized token count
    * systematically UNDERSHOOTS budgetFrac. That is the documented
    * one-pass contract; when hitting the budget matters, set
    * `waterfill = true`: the per-source token sums (one row per
    * stratum — a mixing config is dozens of sources, so this is
    * config-sized, not data-sized) are collected and the rates solved
    * exactly by [[waterfillRates]] (cap saturated sources at 1.0,
    * re-allocate their surplus over the rest, repeat — ≤ #strata
    * rounds), then broadcast back. Same hash-threshold selection, same
    * output schema, exact budget in expectation. */
  def tokenBudgetMix(df: DataFrame, idCol: String, strataCol: String,
                     tokenCount: Column, budgetFrac: Double,
                     alpha: Double, waterfill: Boolean = false): DataFrame = {
    val perSrc = df.groupBy(col(strataCol))
      .agg(sum(tokenCount).cast("double").as("__tok_s"))
    val rates =
      if (waterfill) {
        // Keep the stratum key in its ORIGINAL Spark type: the solve is
        // keyed by collected-row index (never the key's toString, which
        // can disagree with Spark's own cast for timestamp/decimal keys
        // and NPEs on null), and the rates frame is rebuilt from the
        // collected rows with the source schema — the join back is then
        // same-type, no implicit string/double coercion. Null strata
        // never match an equi-join key, so they drop here exactly as in
        // the one-pass path.
        // Drop null token SUMS alongside null keys: an all-null
        // tokenCount column yields sum = null, and getDouble(1) on it
        // would NPE. A null-sum stratum has no measurable tokens — it
        // gets no budget, exactly like the one-pass path where the
        // null rate comparison drops its rows.
        val collected = perSrc.collect()
          .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
        val toks = collected.zipWithIndex
          .map { case (r, i) => i.toString -> r.getDouble(1) }.toSeq
        val solved = waterfillRates(toks, budgetFrac, alpha)
        val outRows = collected.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row(r.get(0),
            BigDecimal(solved(i.toString))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        val spark = df.sparkSession
        val schema = org.apache.spark.sql.types.StructType(Seq(
          perSrc.schema.head.copy(name = strataCol),
          org.apache.spark.sql.types.StructField("__rate",
            org.apache.spark.sql.types.DoubleType)))
        spark.createDataFrame(
          spark.sparkContext.parallelize(outRows.toSeq, 1), schema)
      } else {
        val tot = perSrc.agg(sum(col("__tok_s")).as("__tok_tot"),
          sum(pow(col("__tok_s"), lit(alpha))).as("__pw"))
        perSrc.crossJoin(broadcast(tot))
          .select(col(strataCol),
            round(least(lit(1.0),
              lit(budgetFrac) * col("__tok_tot") *
                pow(col("__tok_s"), lit(alpha - 1)) / col("__pw")), 6).as("__rate"))
      }
    val b = hashBucket(col(idCol), 10000)
    df.join(broadcast(rates), Seq(strataCol))
      .filter(b < round(col("__rate") * 10000))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006
    * A-Res), deterministic: each row gets the key ln(u)/w with
    * u = (h+1)/2⁶⁰ md5-uniform in (0,1] and w its POSITIVE weight; the
    * k LARGEST keys per stratum are an exact weight-proportional sample
    * without replacement. ln(u)/w is the monotone equivalent of the
    * textbook u^(1/w) — division instead of pow keeps the only
    * transcendental call one ln on engine-identical inputs. Keys are
    * rounded to 9 decimals with an id tiebreak, pinning the selection
    * across engines.
    *
    * The 100 TB shape: the key is a pure codegen projection (no RNG
    * state), and the per-stratum top-k runs through Spark's
    * WindowGroupLimit — a PARTIAL k-limit per map partition before the
    * shuffle, so the sort never sees more than k·partitions rows per
    * stratum (PlanSpec's pushdown sweep gates this). Weights must be
    * strictly positive (shift count-like weights by +1); this is the
    * quality-weighted curation sampler — "pick 10k docs ∝ quality
    * score, no duplicates, reproducibly". */
  def weightedSample(df: DataFrame, idCol: String, strataCol: String,
                     weight: Column, k: Int): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val u = (h + lit(1)).cast("double") / lit(math.pow(2, 60))
    // Enforce the strictly-positive contract at runtime: a negative
    // weight would FLIP ln(u)/w to a positive key (those rows would
    // silently sort first — the opposite of weight-proportional) and
    // w = 0 yields ±Inf/NaN keys. Fail loudly instead, like the 62-bit
    // hash check in NearDup.
    val wSafe = when(weight.isNull || weight <= 0,
        raise_error(format_string(
          "weightedSample: weight must be strictly positive, got %s",
          weight.cast("string"))))
      .otherwise(weight.cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col("__k").desc, col(idCol).asc)
    df.withColumn("__k", round(log(u) / wSafe, 9))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(strataCol), col("rnk"), col(idCol),
        col("__k").as("ares_key"))
  }

  /** Exact temperature-rule token allocation with saturation
    * (waterfilling): allocate `budgetFrac · Σtokens` over the sources
    * with share ∝ tokens^α; any source whose allocation exceeds its
    * size is capped at rate 1.0 and its surplus re-allocated over the
    * remaining sources, until no source saturates. Pure driver-side
    * math over the CONFIG-sized (stratum, tokens) list — ≤ one round
    * per stratum, each O(#strata). Returns stratum → keep-rate in
    * [0, 1]; Σ rate_s · tokens_s = budget exactly (unless the budget
    * exceeds the corpus, in which case every rate is 1). */
  def waterfillRates(tokens: Seq[(String, Double)], budgetFrac: Double,
                     alpha: Double): Map[String, Double] = {
    require(budgetFrac >= 0, s"negative budgetFrac: $budgetFrac")
    val total = tokens.map(_._2).sum
    var budget = budgetFrac * total
    var open = tokens.filter(_._2 > 0)
    val rates = Map.newBuilder[String, Double]
    tokens.filter(_._2 <= 0).foreach { case (s, _) => rates += s -> 0.0 }
    var saturating = true
    while (saturating && open.nonEmpty) {
      val pw = open.map { case (_, t) => math.pow(t, alpha) }.sum
      val alloc = open.map { case (s, t) =>
        (s, t, budget * math.pow(t, alpha) / pw) }
      val over = alloc.filter { case (_, t, a) => a >= t }
      if (over.isEmpty) {
        alloc.foreach { case (s, t, a) => rates += s -> (a / t) }
        saturating = false
      } else {
        over.foreach { case (s, _, _) => rates += s -> 1.0 }
        budget -= over.map(_._2).sum
        val capped = over.map(_._1).toSet
        open = open.filterNot { case (s, _) => capped(s) }
      }
    }
    rates.result()
  }
}
