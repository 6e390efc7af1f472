package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality gates for pipeline boundaries — the engine-level form
  * of the reference's implicit load-time assumptions (FK integrity,
  * non-empty keys — EtlHisTurnosCommand.php:130-151 simply trusts its
  * SELECTs; a 100 TB ingest cannot).
  *
  * [[check]] evaluates row-wise expectations in ONE scan (each rule is
  * a conditional count folded into a single hash-agg, whatever the rule
  * count), and returns the long-form (rule, violations) report a
  * quality dashboard ingests. [[uniqueness]] covers the one rule that
  * is not row-wise. [[tableDigest]] is the cross-engine parity check:
  * an order-independent row digest (bit_xor of a per-row md5 slice)
  * that any engine reproduces — the cheap way to answer "did the
  * migration/backfill produce the SAME table?" without shipping rows.
  */
object Quality {

  /** A named row-wise expectation; `violation` must evaluate true on
    * rows that BREAK the rule. */
  final case class Expectation(name: String, violation: Column)

  /** All expectations in one pass: SELECT sum(violation)... — a single
    * hash aggregation, then unpivoted to (rule, violations) rows. */
  def check(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "need at least one expectation")
    val counts = expectations.map(e =>
      sum(when(e.violation, 1L).otherwise(0L)).as(e.name))
    df.agg(counts.head, counts.tail: _*)
      .unpivot(Array.empty[Column], expectations.map(e => col(e.name)).toArray,
        "rule", "violations")
  }

  /** Duplicate-key violations: rows beyond the first per key. One
    * hash-agg pair (count minus distinct-count of the key struct). */
  def uniqueness(df: DataFrame, keyCols: Seq[String], name: String): DataFrame =
    df.agg((count(lit(1)) - count_distinct(struct(keyCols.map(col): _*)))
        .as("violations"))
      .select(lit(name).as("rule"), col("violations"))

  /** Referential-integrity violations: fact rows whose foreign key has
    * no match in the dimension (null FKs are NOT violations — nullable
    * FKs mean "no reference"; add a [[check]] non-null rule when they
    * must exist). One anti-join (broadcast for small dims) + a count —
    * the load-gate form of the FK constraints the reference's Postgres
    * schema declares (PostgresSchemaBuilder.php FK indexes). */
  def fkViolations(fact: DataFrame, dim: DataFrame, fk: String, pk: String,
                   name: String): DataFrame =
    fact.filter(col(fk).isNotNull)
      .join(dim.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("rule"), col("violations"))

  /** Robust per-group outlier detection (median/MAD, the
    * quality-filtering workhorse for heavy-tailed pipeline metrics —
    * unlike mean/stddev, one huge outlier cannot mask the others):
    * flags rows with |v − median| / MAD > k. Exact interpolated
    * percentiles (≡ DuckDB quantile_cont — proven by ex09); the ratio
    * is rounded to 6 decimals so a 1e-15 accumulation difference can't
    * flip the comparison between engines. Groups with MAD = 0 (over
    * half the group identical) flag nothing — a deliberate choice:
    * constant groups have no robust scale to judge against.
    *
    * Shape: two fact scans (value pass, deviation pass) + two
    * group-sized joins — no windows, no per-group sorts. The stats
    * sides are NOT hint-broadcast: they are one row per group, so with
    * dashboard-grade group counts AQE broadcasts them anyway, but a
    * user_id-grade key makes a forced hint a driver OOM — the same
    * reason TurnosPipeline deliberately leaves its paciente dim
    * unhinted. High cardinality falls back to a shuffled join
    * (spec-pinned in QualitySpec). */
  def madOutliers(df: DataFrame, keyCol: String, valueCol: String,
                  k: Double): DataFrame = {
    val med = df.groupBy(col(keyCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"))
    val dev = df.join(med, Seq(keyCol))
      .withColumn("__dev", abs(col(valueCol) - col("__med")))
    val mad = dev.groupBy(col(keyCol))
      .agg(expr("percentile(__dev, 0.5)").as("__mad"))
    dev.join(mad, Seq(keyCol))
      .filter(col("__mad") > 0 && round(col("__dev") / col("__mad"), 6) > k)
  }

  /** Order-independent digest of selected columns: per row, md5 of the
    * null-tagged '|'-joined string form, sliced to a 60-bit long;
    * folded across rows by BOTH bit_xor (`digest`) and a mod-2^60
    * wrapping sum (`digest_sum`) — each commutative + associative →
    * partition-order independent and map-side combinable. Two folds
    * because xor alone is multiplicity-blind: any row with even
    * multiplicity cancels to zero, so {A,A} and {B,B} xor-collide at
    * equal n_rows — exactly the duplicate-shuffling migration bug the
    * digest exists to catch; the sum fold shifts with every extra copy.
    * Each column is tagged 'N' (null) or 'V' + value, so NULL never
    * collides with any string value. Collisions are birthday-bounded
    * (~2^30 rows for 2^60 space); callers compare both digests AND
    * counts. Cast-to-string parity holds for integral and string
    * columns — gate doubles/timestamps behind explicit formatting at
    * the call site. */
  def tableDigest(df: DataFrame, cols: Seq[String], groupBy: Seq[String] = Nil): DataFrame = {
    // Length-prefixed values make the encoding prefix-free: without the
    // length, a '|' inside a value lets different rows canonicalize to
    // the same string (("x|Vy","z") vs ("x","y|Vz")) — a systematic
    // false-equal, not a hash collision.
    val canon = concat_ws("|",
      cols.map(c => when(col(c).isNull, lit("N"))
        .otherwise(concat(lit("V"), length(col(c).cast("string")),
          lit(":"), col(c).cast("string")))): _*)
    val rowHash = conv(substring(md5(canon), 1, 15), 16, 10).cast("long")
    // Sum in decimal(38,0) then reduce mod 2^60: hashes are 60-bit, so
    // the decimal accumulator cannot overflow below ~1e20 rows and the
    // reduced value always fits a long — ANSI-safe, and any engine
    // reproduces it as sum(h) % 2^60 on non-negative h.
    val two60 = lit(BigDecimal(2).pow(60))
    val aggs = Seq(
      bit_xor(rowHash).as("digest"),
      pmod(sum(rowHash.cast("decimal(38,0)")), two60).cast("long").as("digest_sum"),
      count(lit(1)).as("n_rows"))
    if (groupBy.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Distributed logistic-regression training — the TRAINED quality
    * classifier completing the heuristic tx gates (the fastText-style
    * curation step: label a sample, train, score the corpus). Full-batch
    * gradient descent, deterministic by the dq10/tx44 SCALED-INTEGER
    * discipline: each round is ONE map-side-combining aggregation over
    * the feature frame — per feature the EXACT integer sum of
    * `round((σ(margin) − y)·x_j·1e6)` in decimal(38,0) (commutative,
    * associative, overflow-safe to ~1e32 rows — no float-summation
    * order anywhere) — then an O(d) driver update
    * `w_j ← w_j − lr·(Σ/n/1e6)` whose two IEEE divisions are a pinned
    * operation sequence any engine reproduces. The round-17 rewrite
    * replaced `round(avg(err·x), 6)`: an avg's addend order is
    * partition-layout- and engine-dependent, and an avg within an ULP
    * of a 1e-6 boundary then flips the whole trajectory (the dq10
    * boundary flake, observed once in a full-registry sweep; the
    * repartition-sweep spec in QualitySpec now red-tests this). The
    * whole trajectory stays reproducible in SQL as unrolled CTEs
    * (tx42's oracle mirrors the integer sums exactly). Driver state is
    * d doubles — the bounded-collect class of k-means centroids, never
    * rows. Callers include an explicit all-ones bias column.
    *
    * Residual cross-engine hazard: the per-row σ comes from libm exp,
    * so engines differing by an ULP can round a single row's scaled
    * integer differently — but the flip window is ~1e-11 per row
    * (integer grid spacing 1 at 1e6 scale) vs the avg form's ~1e-6 per
    * aggregate, and a one-row ±1 shifts the gradient by 1e-6/n instead
    * of re-ordering an entire float sum.
    *
    * Fails loudly on an empty feature frame or a null feature/label
    * (the repo's fail-loud doctrine): silently training on garbage —
    * or throwing an opaque NPE from Row.getDouble — costs more than
    * the one validating pass. */
  def trainLogistic(feat: DataFrame, labelCol: String,
                    featureCols: Seq[String], rounds: Int,
                    lr: Double): Array[Double] = {
    require(rounds >= 1 && rounds <= 32, s"rounds must be in [1,32]: $rounds")
    require(featureCols.nonEmpty, "need at least one feature column")
    // One validation aggregate before training: row count + per-column
    // null counts (a single map-side-combining job over the same scan
    // the first gradient round reads — cheap next to `rounds` rounds).
    val checkCols = labelCol +: featureCols
    val checks = count(lit(1)) +:
      checkCols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)))
    val chk = feat.agg(checks.head, checks.tail: _*).first()
    if (chk.getLong(0) == 0L) throw new IllegalArgumentException(
      "trainLogistic: empty feature frame — nothing to train on")
    val nullCols = checkCols.zipWithIndex.collect {
      case (c, i) if chk.getLong(i + 1) > 0L => s"$c(${chk.getLong(i + 1)})"
    }
    if (nullCols.nonEmpty) throw new IllegalArgumentException(
      s"trainLogistic: null values in ${nullCols.mkString(", ")} — " +
        "impute or filter before training (nulls would poison every gradient)")
    val n = chk.getLong(0).toDouble
    var w = Array.fill(featureCols.size)(0.0)
    for (_ <- 1 to rounds) {
      val err = logisticP(w, featureCols) - col(labelCol)
      val aggs = featureCols.map(c =>
        sum(round(err * col(c) * 1e6, 0).cast("decimal(38,0)")))
      val g = feat.agg(aggs.head, aggs.tail: _*).first()
      w = Array.tabulate(w.length) { i =>
        // pinned op sequence (mirrored by the oracle): Σ → double,
        // ÷n, ÷1e6, ×lr, subtract
        val gd = g.getDecimal(i).doubleValue() / n / 1e6
        w(i) - lr * gd
      }
    }
    w
  }

  /** Per-row score column under trained weights: round-6 σ(w·x). */
  def logisticScore(weights: Array[Double], featureCols: Seq[String]): Column =
    round(logisticP(weights, featureCols), 6)

  private def logisticP(weights: Array[Double], featureCols: Seq[String]): Column = {
    val margin = featureCols.zip(weights)
      .map { case (c, wi) => col(c) * lit(wi) }.reduce(_ + _)
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

  /** Population-stability-index drift gate: per group, how far the
    * `current` side's value distribution has drifted from the
    * `baseline` side's — PSI = Σ (p−q)·ln(p/q) over fixed-width
    * histogram bins (the monitoring-industry thumb rule: < 0.1 stable,
    * 0.1–0.25 moderate, > 0.25 action). The distribution comparison
    * for ML feature / training-data monitoring: deterministic (same
    * binning as [[graft.operators.EventOps.histogramQuantiles]], no
    * sampling), so it hash-checks against an oracle. Laplace-0.5
    * smoothing over the UNION of observed bins keeps both shares
    * strictly positive — a bin present on one side only contributes a
    * finite term instead of ±∞, and the smoothed PSI of two identical
    * distributions is exactly 0. One scan (both sides counted in one
    * hash agg via the side flag), one group-sized join (AQE
    * broadcast); state is bins × groups, never rows. */
  def psiDrift(df: DataFrame, groupCol: String, valueCol: String,
               baselineSide: Column, binWidth: Double): DataFrame = {
    // null values excluded, as in histogramQuantiles — they'd form a
    // shared null bin that dilutes both shares. A null side flag
    // counts as current (`when` falls through) — pass a null-safe
    // predicate if the split column is nullable.
    val binned = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), floor(col(valueCol) / binWidth).cast("long").as("__bin"))
      .agg(sum(when(baselineSide, 1L).otherwise(0L)).as("__b"),
        sum(when(baselineSide, 0L).otherwise(1L)).as("__c"))
    val tot = binned.groupBy(col(groupCol))
      .agg(sum(col("__b")).as("__tb"), sum(col("__c")).as("__tc"),
        count(lit(1)).as("__nbins"))
    binned.join(tot, Seq(groupCol))
      .withColumn("__p", (col("__b") + 0.5) / (col("__tb") + lit(0.5) * col("__nbins")))
      .withColumn("__q", (col("__c") + 0.5) / (col("__tc") + lit(0.5) * col("__nbins")))
      .groupBy(col(groupCol))
      .agg(round(sum((col("__p") - col("__q")) * log(col("__p") / col("__q"))), 6).as("psi"))
  }

  /** First-significant-digit expectations for Benford's law,
    * log10(1 + 1/d) rounded to 9 decimals — ONE definition feeding
    * both the engine column and the generated oracle literals, so the
    * chi-square statistics agree bitwise up to the 9-term summation
    * (absorbed by the 6-decimal output round). */
  val benfordExpected: Seq[(Int, Double)] = (1 to 9).map { d =>
    d -> BigDecimal(math.log10(1.0 + 1.0 / d))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  }
  /** Σ of the rounded expectations (≈ 1; the exact constant both
    * engines use for the missing-digit correction). */
  val benfordTotal: Double = benfordExpected.map(_._2).sum

  /** Benford first-digit conformance per group — the classic
    * synthetic/fabricated-data detector for a curation pipeline:
    * naturally occurring size-like quantities (document lengths, view
    * counts) follow log10(1+1/d) first-digit frequencies; generated or
    * template-stamped data does not. Reports Pearson's χ² between a
    * group's observed first-digit distribution (positive values only)
    * and Benford's, with digits the group never produced folded in
    * CLOSED FORM — χ² = n·(Σ_observed[(p̂_d−p_d)²/p_d − p_d] + Σ_all p_d)
    * — so no group×digit densification join (and no cross join) is
    * ever planned.
    *
    * Determinism: the first digit comes from the value's decimal
    * STRING (never floor(v/10^⌊log10 v⌋) — libm log10 is not
    * correctly rounded and flips digits at powers of ten), counts are
    * integers, expectations are shared 9-decimal literals; only the
    * 9-term χ² sum floats, under the repo-wide 6-decimal round.
    * Shape at 100 TB: one map-side-combinable (group, digit) count
    * agg; everything downstream is (groups×≤9)-sized.
    * Output: (group, n_pos, chi2). */
  def benford(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Digit basis is the value's INTEGER part (the size-like contract:
    // lengths, counts); values without one — v ∈ (0, 1) included —
    // are excluded by the same cast-then-test predicate that excludes
    // zero and negatives, never silently folded into a "0" digit.
    val obs = df.filter(col(valueCol).cast("long") > 0)
      .select(col(groupCol),
        substring(col(valueCol).cast("long").cast("string"), 1, 1)
          .cast("int").as("digit"))
      .groupBy(col(groupCol), col("digit")).agg(count(lit(1)).as("__c"))
    val tot = obs.groupBy(col(groupCol)).agg(sum(col("__c")).as("__n"))
    val expDf = benfordExpected.toDF("digit", "p_exp")
    val pObs = col("__c").cast("double") / col("__n")
    val diff = pObs - col("p_exp")
    obs.join(tot, Seq(groupCol))
      .join(broadcast(expDf), Seq("digit"))
      .select(col(groupCol), col("__n"),
        (diff * diff / col("p_exp") - col("p_exp")).as("__t"))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n_pos"),
        round((sum(col("__t")) + lit(benfordTotal)) * max(col("__n")), 6)
          .as("chi2"))
  }

  /** Per-group empirical-CDF rank of every row's value, estimated from
    * the [[EventOps.QuantileBottomK]] bottom-k sample — per-source
    * QUALITY-SCORE CALIBRATION: raw quality scores are not comparable
    * across provenances (a web crawl's median differs from curated
    * text), so curation thresholds are set on the per-source
    * percentile, not the raw score. rank(v) = |sample ≤ v| / |sample|,
    * exact when the group fits in k, O(1/√k) above.
    *
    * The 100 TB shape: ONE bounded-state hash agg builds the
    * group-sized sample table, which broadcasts back onto the fact
    * rows; the per-row probe is the native codegen
    * [[graft.plans.ArrayCountLeq]] (k comparisons inside whole-stage
    * codegen, no interpreted lambda in the hot loop). No window, no
    * per-group sort of the fact table — the rank()-window formulation
    * this replaces sorts every group member. Deterministic md5 sample
    * ⇒ oracle-checkable. Requires unique `idCol`; null values drop. */
  def quantileNormalize(df: DataFrame, groupCol: String, idCol: String,
                        valueCol: String, k: Int = 256): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull)
    val sk = udaf(new QuantileBottomK(k))
    val samples = rows.groupBy(col(groupCol))
      .agg(sk(idHash60(col(idCol)), col(valueCol).cast("double")).as("__vs"))
    rows.join(broadcast(samples), Seq(groupCol))
      .select(col(groupCol), col(idCol), col(valueCol),
        round(call_function("graft_array_count_leq",
            col("__vs"), col(valueCol).cast("double")).cast("double") /
          size(col("__vs")), 6).as("pct_rank_est"))
  }

  /** Equi-depth binning — the QuantileDiscretizer / feature-bucketizer
    * primitive: per group, values split into `qs.size + 1` buckets at
    * the [[EventOps.quantileSketch]] thresholds (bucket i ⇔ value ≤
    * the i-th quantile estimate, last bucket above all of them). The
    * standard categorical encoding for heavy-tailed numerics — fixed
    * bucket POPULATIONS instead of dq05/ex19's fixed bucket widths.
    *
    * Scale shape: one bounded-state sketch agg over the facts, the
    * group-sized threshold table pivoted and broadcast back, bucket
    * assignment a codegen'd CASE chain, then one map-side-combinable
    * count/min/max agg. Thresholds inherit the sketch's determinism
    * (md5-pinned sample, 6-decimal rounding), bucket membership is a
    * pure double comparison — bitwise cross-engine.
    * Output: (groupCol, bucket, n, lo, hi). */
  def equidepthBins(df: DataFrame, groupCol: String, idCol: String,
                    valueCol: String, qs: Seq[Double],
                    k: Int = 256): DataFrame = {
    require(qs.nonEmpty && qs == qs.sorted && qs.distinct == qs,
      s"quantile splits must be sorted and distinct, got $qs")
    val th = EventOps.quantileSketch(df, groupCol, idCol, valueCol, qs, k)
    val ths = qs.zipWithIndex.map { case (q, i) =>
      max(when(col("q") === q, col("quantile_est"))).as(s"__t$i")
    }
    val wide = th.groupBy(col(groupCol)).agg(ths.head, ths.tail: _*)
    val bucket = qs.indices.reverse.foldLeft(lit(qs.size): Column) { (acc, i) =>
      when(col(valueCol).cast("double") <= col(s"__t$i"), lit(i)).otherwise(acc)
    }
    df.filter(col(valueCol).isNotNull)
      .join(broadcast(wide), Seq(groupCol))
      .select(col(groupCol), bucket.cast("int").as("bucket"), col(valueCol))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }

  /** Two-sample Kolmogorov–Smirnov drift per group — the rank-based
    * sibling of [[psiDrift]] (PSI needs a bin width; KS is
    * distribution-free): split rows into baseline/current by
    * `baselineSide`, sketch each side with [[EventOps.QuantileBottomK]]
    * (bounded k state), and take sup |F̂_base(x) − F̂_cur(x)| over the
    * union of both samples' points — the exact two-sample KS statistic
    * OF THE SAMPLES, within O(1/√k) of the population statistic.
    *
    * Scale shape: one bounded-state hash agg over the facts, then all
    * arithmetic on group-sized rows (the 2·k-point sup is a per-group
    * array traversal, dim-scale, HOF cost irrelevant there). Both
    * counts are integers, both CDFs exact integer ratios — engines
    * agree bitwise before the final 6-decimal rounding.
    * Output: (groupCol, n_base, n_cur, ks). Groups missing a side drop
    * (no drift to measure). */
  def ksDrift(df: DataFrame, groupCol: String, idCol: String,
              valueCol: String, baselineSide: Column,
              k: Int = 256): DataFrame = {
    val sk = udaf(new QuantileBottomK(k))
    val sides = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), baselineSide.as("__base"))
      .agg(sk(idHash60(col(idCol)), col(valueCol).cast("double")).as("__vs"))
    val a = sides.filter(col("__base")).select(col(groupCol), col("__vs").as("__a"))
    val b = sides.filter(!col("__base")).select(col(groupCol), col("__vs").as("__b"))
    def cdf(sample: Column, x: Column): Column =
      call_function("graft_array_count_leq", sample, x).cast("double") /
        size(sample)
    a.join(b, Seq(groupCol))
      .select(col(groupCol),
        size(col("__a")).cast("long").as("n_base"),
        size(col("__b")).cast("long").as("n_cur"),
        round(array_max(transform(concat(col("__a"), col("__b")),
          x => abs(cdf(col("__a"), x) - cdf(col("__b"), x)))), 6).as("ks"))
  }

  /** The repo-wide 60-bit md5-prefix row-id hash (the KMV/quantile-
    * sketch convention) — one definition here so the two sketch
    * consumers above can never drift from the oracle's formula. */
  private def idHash60(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** One-pass column profile — the data-governance "describe" table:
    * per column, presence/null counts, distinct count, and min/max
    * (stringified for a uniform long-form schema — profile integer/
    * string columns; float min/max stringification is engine-dependent,
    * round or cast those upstream). ALL columns profile in ONE hash
    * aggregation over a single scan (the stack unpivot is projection),
    * so profiling cost does not grow with the column count beyond the
    * agg-buffer width. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    // Identifier safety: user column names appear ONLY as backtick-
    // escaped references (`` escapes a literal backtick) and as lit()
    // values — never spliced into selectExpr or into generated alias
    // names, where a quote/space/dot would break parsing or inject SQL
    // into the plan. Internal aliases are POSITIONAL (__cnt_0, ...).
    def ref(c: String) = col("`" + c.replace("`", "``") + "`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      count(ref(c)).as(s"__cnt_$i"),
      count_distinct(ref(c)).as(s"__dst_$i"),
      min(ref(c)).cast("string").as(s"__min_$i"),
      max(ref(c)).cast("string").as(s"__max_$i"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    // Unpivot via explode(array(struct(...))) — pure Column expressions
    // (same projection-only cost as stack(), no string parsing).
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col(s"__cnt_$i").as("__present"),
        col(s"__dst_$i").as("n_distinct"), col(s"__min_$i").as("min_val"),
        col(s"__max_$i").as("max_val"))
    }
    one.select(col("n_rows"), explode(array(entries: _*)).as("__e"))
      .select(col("__e.col_name").as("col_name"), col("n_rows"),
        (col("n_rows") - col("__e.__present")).as("n_null"),
        col("__e.n_distinct").as("n_distinct"),
        col("__e.min_val").as("min_val"), col("__e.max_val").as("max_val"))
  }

  /** EWMA control chart over a per-(group, period) count series — the
    * SPC drift monitor (Roberts 1959; NIST/SEMATECH e-handbook §6.3.2.4)
    * a pipeline runs on its daily ingest volumes: smooth each group's
    * series with an exponentially weighted moving average and score each
    * period's deviation from the smoothed level in group-σ units.
    *
    * EWMA via the standard recurrence (ewma_1 = x_1; ewma_t = α·x_t +
    * (1−α)·ewma_{t−1}) evaluated as a SEQUENTIAL array fold over each
    * group's day-ordered series — one fixed IEEE operation sequence,
    * so engine and oracle agree bit-for-bit (the inline comment below
    * records why the closed-form triangular-join alternative was
    * rejected: its unordered parallel float sum can land within an ULP
    * of a round-6 boundary and flip between runs/engines). The rollup
    * is (groups × periods)-sized — bounded by the calendar, not by
    * fact volume — so the per-group collect_list array is the k-means-
    * centroid class, and the one fact-scale shuffle is the rollup
    * count itself, map-side combinable.
    *
    * Output: one row per (group, period) — the raw count, the EWMA
    * level, and `dev_sigma` = |x − ewma| / σ_group (population σ of the
    * group's counts; 0 when σ = 0). Callers flag rows at their control
    * limit (classically dev_sigma > 3·√(α/(2−α))). */
  def ewmaControl(df: DataFrame, groupCol: String, tsCol: String,
                  alpha: Double = 0.3): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val daily = df.groupBy(col(groupCol),
        to_date(date_trunc("day", col(tsCol))).as("day"))
      .agg(count(lit(1)).cast("long").as("x"))
    // Period index: window over the rollup, partitioned per group —
    // calendar-bounded input, never fact-scale.
    val w = Window.partitionBy(col(groupCol)).orderBy(col("day").asc)
    val idx = daily.select(col(groupCol), col("day"), col("x"),
      row_number().over(w).cast("long").as("__t"))
    // σ from EXACT integer sums (Σx, Σx² in decimal — overflow-safe
    // and order-independent), then ONE pinned float op sequence:
    // sqrt(max(0, Σx²/n − (Σx/n)²)). A parallel stddev_pop's float
    // accumulation order is engine- and schedule-dependent — the same
    // boundary-flip class as the EWMA sum below.
    val sigma = idx.groupBy(col(groupCol))
      .agg(sum(col("x").cast("decimal(38,0)")).as("__sx"),
        sum((col("x").cast("decimal(18,0)") * col("x").cast("decimal(18,0)")))
          .as("__sq"),
        count(lit(1)).cast("double").as("__n"))
      .select(col(groupCol),
        sqrt(greatest(lit(0.0),
          col("__sq").cast("double") / col("__n") -
            (col("__sx").cast("double") / col("__n")) *
            (col("__sx").cast("double") / col("__n")))).as("__sigma"))
    // EWMA via the RECURRENCE as a sequential array fold, not the
    // closed-form Σ x_k·w(t,k) triangular join: a parallel float sum's
    // addend order is nondeterministic (partial-agg order here, morsel
    // scheduling in the oracle engine), and a sum landing within an
    // ULP of a round-6 boundary then flips between runs/engines — the
    // round-17 dq10 flake, observed once in a full-registry sweep. A
    // fold `acc ← α·x + (1−α)·acc` over the per-group DAY-ORDERED
    // series is one fixed IEEE operation sequence, so engine and
    // oracle agree bit-for-bit with no rounding luck. Also strictly
    // cheaper: per-group arrays are calendar-bounded (the collect_list
    // is the k-means-centroid class, never fact-scale) and the old
    // agg² join and pow() calls are gone.
    val series = idx.groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col("__t"), col("x")))).as("__s"))
    val xs = transform(col("__s"), s => s.getField("x").cast("double"))
    idx.join(series, Seq(groupCol))
      .withColumn("__ewma",
        aggregate(slice(xs, lit(2), col("__t").cast("int") - 1),
          element_at(xs, 1),
          (acc, v) => lit(alpha) * v + lit(1 - alpha) * acc))
      .join(sigma, Seq(groupCol))
      .select(col(groupCol), col("day"), col("x"),
        round(col("__ewma"), 6).as("ewma"),
        round(when(col("__sigma") > 0,
          abs(col("x") - col("__ewma")) / col("__sigma")).otherwise(0.0), 6)
          .as("dev_sigma"))
  }
}
