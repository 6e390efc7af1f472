package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Bottom-k buffer of DISTINCT hashes, ascending — the KMV sketch state. */
case class KmvBuf(hs: Seq[Long])

/** (number of retained hashes, largest retained hash) — enough to form
  * the KMV estimate downstream without re-sorting anything. */
case class KmvSketch(n: Long, hk: Long)

/** Bottom-k-of-distinct as a typed [[Aggregator]]: state is AT MOST k
  * longs per group at every point of the aggregation — map-side partial
  * buffers included — and merge is the KMV union rule (union → re-take
  * the k smallest), so partial aggregation shrinks every group to ≤ k
  * values BEFORE the shuffle. This replaces the per-group global sort
  * (window row_number over all distinct hashes), which at 100 TB would
  * funnel billions of distinct hashes into one sort task per key. */
class KmvBottomK(k: Int) extends Aggregator[Long, KmvBuf, KmvSketch] {
  require(k > 1, s"KMV needs k > 1, got $k")
  def zero: KmvBuf = KmvBuf(Vector.empty)
  def reduce(b: KmvBuf, h: Long): KmvBuf =
    if (b.hs.length == k && h >= b.hs.last) b // can't enter the bottom-k
    else if (b.hs.contains(h)) b
    else KmvBuf((b.hs :+ h).sorted.take(k))
  def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
    KmvBuf((a.hs ++ b.hs).distinct.sorted.take(k))
  def finish(b: KmvBuf): KmvSketch =
    KmvSketch(b.hs.length.toLong, if (b.hs.isEmpty) 0L else b.hs.last)
  def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  def outputEncoder: Encoder[KmvSketch] = Encoders.product[KmvSketch]
}

/** [[KmvBottomK]] that surfaces the RETAINED HASH SET itself (ascending,
  * ≤ k longs) instead of the collapsed (n, hk) pair — the form needed
  * for KMV SET OPERATIONS, where two strata's sketches are merged and
  * intersected downstream. Same ≤ k-longs-per-group state bound. */
class KmvBottomKSet(k: Int) extends Aggregator[Long, KmvBuf, Seq[Long]] {
  private val inner = new KmvBottomK(k)
  def zero: KmvBuf = inner.zero
  def reduce(b: KmvBuf, h: Long): KmvBuf = inner.reduce(b, h)
  def merge(a: KmvBuf, b: KmvBuf): KmvBuf = inner.merge(a, b)
  def finish(b: KmvBuf): Seq[Long] = b.hs
  def bufferEncoder: Encoder[KmvBuf] = inner.bufferEncoder
  def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** One (hash, value) pair retained by [[QuantileBottomK]]. */
case class QsRow(h: Long, v: Double)
/** Buffer rows sorted by (hash, value) ascending, capped at k. */
case class QsBuf(rows: Seq[QsRow])

/** Mergeable quantile sketch as a typed [[Aggregator]]: the k rows with
  * the SMALLEST row-id hashes — a deterministic uniform-without-
  * replacement row sample (bottom-k sampling, Cohen & Kaplan 2007) —
  * carrying their values; quantile estimates are order statistics of
  * the sampled values. State is AT MOST k (hash, value) pairs at every
  * stage, map-side partials included, and merge is the bottom-k union
  * rule — a semilattice, so the sketch is a pure function of the input
  * SET: any partitioning, any merge order, any engine produces the
  * identical sketch. That is the property KLL/t-digest fundamentally
  * lack (randomized / merge-order-dependent compaction), and it is what
  * makes this sketch DuckDB-oracle-checkable like the KMV family; the
  * price is O(1/√k) rank error instead of KLL's O(1/k) — exact whenever
  * the group has ≤ k rows. Hashes are assumed distinct (unique row
  * ids); identical (h, v) duplicates collapse, keeping merges
  * idempotent under shard overlap. */
class QuantileBottomK(k: Int) extends Aggregator[QsRow, QsBuf, Seq[Double]] {
  require(k > 1, s"quantile sketch needs k > 1, got $k")
  def zero: QsBuf = QsBuf(Vector.empty)
  def reduce(b: QsBuf, r: QsRow): QsBuf =
    if (b.rows.length == k && r.h >= b.rows.last.h) b // can't enter
    else if (b.rows.contains(r)) b
    else QsBuf((b.rows :+ r).sortBy(x => (x.h, x.v)).take(k))
  def merge(a: QsBuf, b: QsBuf): QsBuf =
    QsBuf((a.rows ++ b.rows).distinct.sortBy(x => (x.h, x.v)).take(k))
  def finish(b: QsBuf): Seq[Double] = b.rows.map(_.v).sorted
  def bufferEncoder: Encoder[QsBuf] = Encoders.product[QsBuf]
  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** One top-k candidate: descending-`score` rank with ascending-`id`
  * tiebreak (a total order), `id` doubling as the carried payload key. */
case class TopKRow(score: Double, id: Long)

/** Buffer rows are kept sorted best-first and capped at k. */
case class TopKBuf(rows: Seq[TopKRow])

/** Grouped top-k as a typed [[Aggregator]]: state is AT MOST k rows per
  * group at every stage — map-side partial buffers included — so the
  * shuffle carries ≤ k rows per group instead of the whole group, and
  * no per-group sort ever runs. This is the fact-scale form of "top n
  * per key"; the window row_number form shuffles and sorts EVERY group
  * member (fine at dim scale, the hot-key bottleneck at 100 TB). */
class TopKByScore(k: Int) extends Aggregator[TopKRow, TopKBuf, TopKBuf] {
  require(k > 0, s"top-k needs k > 0, got $k")
  private def better(a: TopKRow, b: TopKRow): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)
  def zero: TopKBuf = TopKBuf(Vector.empty)
  def reduce(b: TopKBuf, r: TopKRow): TopKBuf =
    if (b.rows.length == k && !better(r, b.rows.last)) b // can't enter
    else TopKBuf((b.rows :+ r).sortWith(better).take(k))
  def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf((a.rows ++ b.rows).sortWith(better).take(k))
  def finish(b: TopKBuf): TopKBuf = b
  def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

/** Event-stream analytics in batch form (SURVEY EX-01..04, EX-08).
  * Streaming variants (same semantics under a watermark) live in
  * [[graft.streaming.StreamingOps]].
  *
  * Scale: every aggregation here is a single hash shuffle with map-side
  * partial aggregation; the session-window groupBy shuffles once on the
  * session key. At 100 TB, partition the source by event date so the
  * time-window groupBy reads pruned partitions.
  */
object EventOps {

  /** EX-01: epoch-aligned tumbling window aggregation. Uses Spark's
    * native `window()` (struct of start/end); we project the start. */
  def tumblingAgg(events: DataFrame, minutes: Int): DataFrame =
    events
      .groupBy(
        window(col("ts"), s"$minutes minutes").getField("start").as("bucket_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        // exact decimal sum internally; DOUBLE output (never DECIMAL in a
        // final schema — the gate canonicalizes it differently).
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("total_value"))

  /** EX-02: session windows with a fixed inactivity gap — Spark's
    * `session_window` (start = first event, end = last event + gap). */
  def sessionAgg(events: DataFrame, gapMinutes: Int): DataFrame =
    events
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window").getField("start").as("session_start"),
        col("session_window").getField("end").as("session_end"),
        col("n_events"))

  /** EX-03: keyed dedup — first event per key in event-time order
    * (batch analog of dropDuplicatesWithinWatermark; deterministic
    * tiebreak on event_id). */
  def dedupKeyed(events: DataFrame, keys: Seq[String]): DataFrame =
    Dedup.firstWins(events, keys, Seq(col("ts").asc, col("event_id").asc))

  /** EX-04: exact distinct per group. */
  def distinctUsers(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))

  /** EX-04b: approximate distinct (HyperLogLog++) — the 100 TB path:
    * constant memory per group vs a full shuffle of distinct pairs.
    * Not oracle-checkable (estimator-specific); driver rows-only. */
  def approxDistinctUsers(events: DataFrame, rsd: Double = 0.05): DataFrame =
    events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"))

  /** [[approxDistinctUsers]] with a DETERMINISTIC gate: emits the
    * exact distinct count next to a boolean asserting the HLL estimate
    * landed within `tol` of it. The estimate itself never leaves the
    * query (HLL internals are not cross-engine reproducible), but both
    * output columns ARE — an oracle pins `within_band = TRUE`, so an
    * estimator drift past the band hash-fails instead of passing a
    * rows-only check. tol = 3× the rsd default (≈ 3σ of the sketch's
    * relative standard error). The exact count alongside is the audit
    * shape, not the production path — at 100 TB the HLL runs alone
    * (constant state) and this pairing is the calibration query run on
    * a sampled slice. */
  def approxDistinctWithinBand(events: DataFrame, rsd: Double = 0.05,
                               tol: Double = 0.15): DataFrame =
    events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id"), rsd).as("__hll"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("__hll").cast("double") - col("n_exact")) <=
          col("n_exact") * tol).as("within_band"))

  /** EX-04c: KMV (k-minimum-values) distinct estimator — the
    * VERIFIABLE approximate-distinct: estimate = (k−1)·2⁶⁰ / h_k, with
    * h_k the k-th smallest distinct 60-bit md5-derived hash per group
    * (exact count when a group has fewer than k distinct values).
    * Deterministic given the hash function, so any engine reproduces
    * the identical estimate — unlike HLL this one hash-checks against
    * the DuckDB oracle. The bottom-k sets are also mergeable (union →
    * re-take k smallest), the property a distributed sketch needs.
    *
    * Shape: ONE hash aggregation via the [[KmvBottomK]] Aggregator —
    * bounded (≤ k longs) state per group at every stage, map-side
    * partials included, mergeable by the KMV union rule. No per-group
    * global sort anywhere (the earlier window-row_number form funneled
    * ALL distinct hashes of a group into a single sort task — wrong
    * shape at 100 TB). HLL above remains the constant-state production
    * sketch; KMV is the auditable one. All arithmetic is exact in IEEE
    * double ((k−1)·2⁶⁰ has ≤6 significant bits) followed by ONE
    * division, so both engines agree bitwise. Null user_id rows are
    * excluded (none exist in the fixtures; the sketch counts values). */
  def kmvDistinctUsers(events: DataFrame, k: Int = 64): DataFrame = {
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10).cast("long")
    val bottomK = udaf(new KmvBottomK(k))
    events.select(col("event_type"), h.as("h"))
      .where(col("h").isNotNull)
      .groupBy(col("event_type"))
      .agg(bottomK(col("h")).as("__s"))
      .select(col("event_type"),
        when(col("__s.n") < k, col("__s.n").cast("double"))
          .otherwise(round(lit((k - 1).toDouble * math.pow(2, 60)) / col("__s.hk"), 6))
          .as("est_users"))
  }

  /** Pairwise KMV set-operation estimates between per-stratum DISTINCT
    * hash sets (Beyer et al. 2007): per stratum one bottom-k sketch
    * ([[KmvBottomKSet]] — ≤ k longs of state, map-side combined), then
    * for every stratum pair (a < b) the merged sketch = bottom-k of the
    * sketch union, |A∪B| from its kth value ((k−1)·2⁶⁰/h_k, the ex04b
    * estimator — exact when the merge holds under k hashes), Jaccard =
    * share of merged hashes present in BOTH sketches, |A∩B| = J·|A∪B|.
    *
    * The 100 TB shape: the corpus pass is ONE hash aggregation whose
    * per-group state is k longs; everything after operates on the
    * stratum-sized sketch table (a mixing config is dozens of sources),
    * so the a<b pair join is a broadcast of tiny-by-construction rows
    * (PlanSpec-whitelisted) and the set arithmetic is codegen'd array
    * ops over 64-element arrays. Deterministic md5-derived hashes ⇒
    * identical estimates in any engine — fully oracle-checkable.
    * Input: (strataCol, hashCol) rows, duplicates fine (the sketch
    * dedups); hashes must be the 60-bit md5-prefix convention.
    * Output: (src_a, src_b, est_union, jaccard, est_inter). */
  def kmvSetOverlap(rows: DataFrame, strataCol: String, hashCol: String,
                    k: Int = 64): DataFrame = {
    val bottomK = udaf(new KmvBottomKSet(k))
    // The (k−1)·2⁶⁰/h_k estimator is only valid under the 60-bit
    // md5-prefix hash convention; a full-64-bit or negative hash would
    // silently produce wildly wrong est_union. Enforce the range at
    // the sketch projection instead of documenting it away.
    val hSafe = when(col(hashCol) < 0 || col(hashCol) >= lit(1L << 60),
        raise_error(format_string(
          "kmvSetOverlap: hash outside [0, 2^60) — not the md5-prefix " +
            "convention: %s", col(hashCol).cast("string"))))
      .otherwise(col(hashCol))
    val sk = rows.where(col(hashCol).isNotNull)
      .groupBy(col(strataCol))
      .agg(bottomK(hSafe).as("__hs"))
    val a = sk.select(col(strataCol).as("src_a"), col("__hs").as("__ha"))
    val b = sk.select(col(strataCol).as("src_b"), col("__hs").as("__hb"))
    val merged = slice(array_sort(array_union(col("__ha"), col("__hb"))), 1, k)
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), col("__ha"), col("__hb"),
        merged.as("__u"))
      .select(col("src_a"), col("src_b"),
        size(col("__u")).as("__m"),
        element_at(col("__u"), size(col("__u"))).as("__hk"),
        size(array_intersect(array_intersect(col("__u"), col("__ha")),
          col("__hb"))).as("__jn"))
      .select(col("src_a"), col("src_b"),
        when(col("__m") < k, col("__m").cast("double"))
          .otherwise(round(lit((k - 1).toDouble * math.pow(2, 60)) / col("__hk"), 6))
          .as("est_union"),
        round(col("__jn").cast("double") / col("__m"), 6).as("jaccard"))
      .withColumn("est_inter", round(col("est_union") * col("jaccard"), 6))
  }

  /** Count-min sketch over a string key column: `depth` md5-derived
    * hash rows × `width` buckets. The sketch is the (row, bucket) →
    * count table — AT MOST depth·width cells regardless of input size
    * or cardinality, built by ONE explode + hash aggregation with
    * map-side partials (each input row contributes `depth` cells).
    * Like the KMV estimator, the hash family is md5-derived and shared
    * with the DuckDB oracle, so the sketch — an approximate structure —
    * is bitwise reproducible in any engine.
    *
    * Row i's bucket for key k = first-15-hex-chars(md5(i || '_' + k))
    * mod width — independent enough across rows for the CM guarantee
    * (estimate ≥ true count; error ≤ N/width with prob 1−2^−depth).
    * Null keys are excluded (values-only, the KMV posture). */
  def cmsSketch(df: DataFrame, keyCol: String,
                depth: Int = 4, width: Int = 256): DataFrame =
    df.where(col(keyCol).isNotNull)
      .select(cmsCells(keyCol, depth, width).as("cell"))
      .groupBy(col("cell.row"), col("cell.bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** The md5 hash family shared by the sketch build and the probe side
    * — ONE definition so the two can never drift apart (drifted probes
    * would still inner-join real buckets and corrupt every estimate
    * silently). */
  private def cmsCells(keyCol: String, depth: Int, width: Int): Column =
    explode(array((0 until depth).map { i =>
      struct(lit(i).as("row"),
        (conv(substring(md5(concat(lit(s"${i}_"), col(keyCol))), 1, 15), 16, 10)
          .cast("long") % width).as("bucket"))
    }: _*))

  /** Heavy hitters via the count-min sketch: each candidate's estimate
    * is the MIN over the sketch's depth rows of its bucket count; the
    * top `k` by (estimate, key) are returned. TWO passes over the
    * input — sketch build plus the distinct candidate set (both single
    * hash aggs with map-side partials); the one-pass production
    * deployment replaces the candidate scan with a SpaceSaving-style
    * buffer. Estimates are upper bounds: collisions only ever inflate
    * a bucket. */
  def cmsTopK(df: DataFrame, keyCol: String, k: Int,
              depth: Int = 4, width: Int = 256): DataFrame = {
    val sketch = cmsSketch(df, keyCol, depth, width)
    val cand = df.select(col(keyCol)).where(col(keyCol).isNotNull).distinct()
    cand.select(col(keyCol), cmsCells(keyCol, depth, width).as("cell"))
      .select(col(keyCol), col("cell.row").as("row"), col("cell.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy(col(keyCol))
      .agg(min(col("cnt")).as("est"))
      .orderBy(col("est").desc, col(keyCol).asc)
      .limit(k)
  }

  /** EX-01b: sliding window aggregation — each event lands in
    * windowLen/slide buckets (Spark's `window()` with a slide emits one
    * row per covering window; still a single hash shuffle). */
  def slidingAgg(events: DataFrame, windowMinutes: Int, slideMinutes: Int): DataFrame =
    events
      .groupBy(
        window(col("ts"), s"$windowMinutes minutes", s"$slideMinutes minutes")
          .getField("start").as("bucket_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("total_value"))

  /** As-of join: for each left row, the LATEST right row with
    * right.ts <= left.ts for the same key (null when none).
    *
    * Implemented as union + last-non-null carry-forward window — ONE
    * shuffle on the key, no range-join row explosion: the classic
    * scalable as-of shape (a range join is O(|L|·|R|) per key; this is
    * O((|L|+|R|) log) via the window sort). Right rows sort BEFORE left
    * rows at equal ts, so an exactly-simultaneous right row matches
    * (<= semantics, like an ASOF JOIN's ts >= condition).
    *
    * `payloadCols` of the right side are exposed as `<prefix><col>`;
    * right side should be unique per (key, ts) for a deterministic
    * result — pre-aggregate if not. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               payloadCols: Seq[String], prefix: String = "r_"): DataFrame = {
    val rPrep = right.select(
      col(key), col(tsCol), lit(1).as("__r"),
      struct(col(tsCol).as("__pts") +: payloadCols.map(col): _*).as("__payload"))
    val pType = rPrep.schema("__payload").dataType
    val lPrep = left
      .withColumn("__r", lit(0))
      .withColumn("__payload", lit(null).cast(pType))
    val unioned = lPrep.unionByName(rPrep, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__asof",
      last(col("__payload"), ignoreNulls = true).over(w))
    val expanded = carried.filter(col("__r") === 0)
      .withColumn(s"$prefix$tsCol", col("__asof.__pts"))
    payloadCols.foldLeft(expanded) { (df, c) =>
      df.withColumn(s"$prefix$c", col(s"__asof.$c"))
    }.drop("__r", "__payload", "__asof")
  }

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * right.ts >= left.ts for the same key (null when none) — the
    * "next event after" lookup (next maintenance slot, next price
    * tick). Same union + carry window shape as [[asofJoin]] (ONE key
    * shuffle, no range-join explosion), with the scan direction
    * reversed: the order is ts DESC so the carried value is the
    * nearest FOLLOWING right row; right still sorts before left at
    * equal ts, so an exactly-simultaneous right row matches (>=). */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      tsCol: String, payloadCols: Seq[String],
                      prefix: String = "r_"): DataFrame = {
    val rPrep = right.select(
      col(key), col(tsCol), lit(1).as("__r"),
      struct(col(tsCol).as("__pts") +: payloadCols.map(col): _*).as("__payload"))
    val pType = rPrep.schema("__payload").dataType
    val lPrep = left
      .withColumn("__r", lit(0))
      .withColumn("__payload", lit(null).cast(pType))
    val unioned = lPrep.unionByName(rPrep, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).desc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__asof",
      last(col("__payload"), ignoreNulls = true).over(w))
    val expanded = carried.filter(col("__r") === 0)
      .withColumn(s"$prefix$tsCol", col("__asof.__pts"))
    payloadCols.foldLeft(expanded) { (df, c) =>
      df.withColumn(s"$prefix$c", col(s"__asof.$c"))
    }.drop("__r", "__payload", "__asof")
  }

  /** Interval (point-in-range) join without the nested-loop trap: a
    * plain `l.ts BETWEEN r.start AND r.end` predicate gives Spark a
    * BroadcastNestedLoopJoin (O(|L|·|R|) per key). Instead each interval
    * is exploded into the fixed-width time bins it covers and each
    * point into its one bin, turning the range join into an EQUI-join
    * on (key, bin) + a residual filter — a hash join, shuffle-
    * partitioned, linear in rows × bins-per-interval. `binMinutes`
    * should be ≥ the typical interval length so intervals explode into
    * O(1) bins. Interval semantics: [start, end). */
  def intervalJoinBinned(points: DataFrame, intervals: DataFrame, key: String,
                         tsCol: String, startCol: String, endCol: String,
                         binMinutes: Int): DataFrame = {
    val binUs = binMinutes * 60000000L
    def bin(c: Column): Column = floor(unix_micros(c) / binUs)
    val binned = intervals.withColumn("__bin",
      explode(sequence(bin(col(startCol)),
        // end is exclusive: an interval ending exactly on a bin edge
        // does not cover that bin.
        floor((unix_micros(col(endCol)) - 1) / binUs))))
    points.withColumn("__bin", bin(col(tsCol)))
      .join(binned, Seq(key, "__bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }

  /** Time-series gap filling (resampling): the per-key hourly rollup,
    * densified so every key has a row for EVERY hour between its first
    * and last event — missing hours carry n=0 / total=0. The grid comes
    * from `sequence(first, last, 1 hour)` exploded per key (output is
    * bounded by Σ per-key span, never a cross product), then one
    * co-partitioned left join back onto the sparse rollup — both sides
    * hash on (key, hour), so at 100 TB this is two shuffles of
    * rollup-sized data, not of the raw events. */
  def gapFillHourly(events: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("h"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("__s"))
    val grid = hourly.groupBy(col(keyCol))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col(keyCol),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    grid.join(hourly, Seq(keyCol, "h"), "left")
      .select(col(keyCol), col("h"),
        coalesce(col("n"), lit(0L)).as("n"),
        round(coalesce(col("__s"), lit(0)).cast("double"), 2).as("total"))
  }

  /** Ordered funnel: for each user, the time of stage 1 is the first
    * `stages(0)` event; stage i+1 is the first `stages(i+1)` event
    * STRICTLY AFTER the user's stage-i time. Returns one row per user
    * (all users with any event) with nullable t1..tn — null = never
    * reached. No windows over the fact table and no self-joins: each
    * stage is filter → join the (user, t_prev) stage table → hash agg,
    * all shuffling on the user key, with stage tables user-sized. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val stageTimes = stages.zipWithIndex.foldLeft(Seq.empty[DataFrame]) {
      case (acc, (stage, i)) =>
        val name = s"t${i + 1}"
        val filtered = events.filter(col(typeCol) === stage)
          .select(col(userCol), col(tsCol))
        val st =
          if (i == 0)
            filtered.groupBy(col(userCol)).agg(min(col(tsCol)).as(name))
          else {
            val prev = s"t$i"
            filtered.join(acc.last.select(col(userCol), col(prev)), Seq(userCol))
              .filter(col(tsCol) > col(prev))
              .groupBy(col(userCol)).agg(min(col(tsCol)).as(name))
          }
        acc :+ st
    }
    val users = events.select(col(userCol)).distinct()
    stageTimes.foldLeft(users)((u, st) => u.join(st, Seq(userCol), "left"))
  }

  /** Ordered event-sequence pattern matching — the MATCH_RECOGNIZE /
    * behavioral-regex family (funnels are the special case
    * `a.*b.*c`). Per entity, the stream collapses to one character per
    * event in (ts, id) order and a regex counts NON-overlapping
    * occurrences.
    *
    * Determinism contract: `idCol` must be unique per entity (total
    * order ⇒ one canonical sequence string), and `pattern` must keep
    * match boundaries unambiguous across regex engines — concretely,
    * every quantified class must EXCLUDE the characters that can start
    * or end a match (e.g. `v[ces]*p`, never `v.*p`): then greedy
    * (Java) and leftmost (RE2/DuckDB) scanning produce identical
    * non-overlapping match sets.
    *
    * Scale shape: one hash aggregation keyed by entity; state per
    * group is that entity's event list — the same per-entity bound as
    * session windows (EX-02), NOT corpus-sized — and `maxSeqLen`
    * BOUNDS it: a cheap scalar-state count pass first finds whale
    * entities (> maxSeqLen events), which are excluded from the
    * collect (their row reports the true event count with
    * `n_matches = NULL, capped = true` — cap-and-flag, never a
    * multi-GB aggregation buffer in one task). Whales are by
    * definition few, so the anti-join side broadcasts. The sort is
    * `array_sort` INSIDE each group's buffer (local, no window, no
    * shuffle beyond the groupBy); the regex runs codegen'd per row on
    * the collapsed string.
    * Output: (key, seq_len, n_matches, capped). */
  def sequencePattern(events: DataFrame, keyCol: String, tsCol: String,
                      idCol: String, eventChar: Column, pattern: String,
                      maxSeqLen: Int = 1 << 20): DataFrame = {
    require(maxSeqLen >= 1, s"maxSeqLen must be >= 1, got $maxSeqLen")
    validatePattern(pattern)
    val counts = events.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"))
    val whales = counts.filter(col("__n") > maxSeqLen)
    val matched = events
      .join(broadcast(whales.select(col(keyCol))), Seq(keyCol), "left_anti")
      .groupBy(col(keyCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(
            col(tsCol).as("t"), col(idCol).as("i"), eventChar.as("c")))),
          x => x.getField("c")), "").as("__seq"))
      .select(col(keyCol),
        length(col("__seq")).cast("bigint").as("seq_len"),
        size(regexp_extract_all(col("__seq"), lit(pattern), lit(0)))
          .cast("bigint").as("n_matches"),
        lit(false).as("capped"))
    matched.unionByName(whales.select(col(keyCol),
      col("__n").cast("bigint").as("seq_len"),
      lit(null).cast("bigint").as("n_matches"),
      lit(true).as("capped")))
  }

  /** Guard for [[sequencePattern]]'s cross-engine determinism
    * contract: the quantified-class rule ("classes must exclude the
    * characters that can start or end a match") was documentation
    * only — a pattern like `v.*p` would silently diverge between
    * Java's greedy and RE2/DuckDB's leftmost scanning. Rejects the
    * two unbounded forms (`.` and negated classes, which can always
    * absorb an anchor char) and any explicit class+quantifier that
    * contains the pattern's first or last literal character. */
  private[operators] def validatePattern(pattern: String): Unit = {
    require(pattern.nonEmpty, "pattern must be non-empty")
    require(!pattern.contains("."),
      s"pattern '$pattern' contains '.': an unbounded class can absorb " +
        "match-boundary chars, so Java and RE2/DuckDB match sets diverge")
    require(!pattern.contains("[^"),
      s"pattern '$pattern' contains a negated class: unbounded over the " +
        "alphabet, same cross-engine divergence as '.'")
    val anchors = Set(pattern.head, pattern.last)
    val quantClass = "\\[([^\\]]*)\\][*+?{]".r
    quantClass.findAllMatchIn(pattern).foreach { m =>
      val cls = m.group(1)
      val hit = anchors.filter(cls.contains(_))
      require(hit.isEmpty,
        s"pattern '$pattern': quantified class [$cls] contains anchor " +
          s"char(s) ${hit.mkString(",")} — match boundaries become " +
          "ambiguous across regex engines")
    }
  }

  /** OHLC bars: per (tumbling window, key) the first/max/min/last
    * value — the financial-bars / telemetry-rollup shape. `min_by` /
    * `max_by` with a (ts, id) struct ordering key pick open/close
    * EXACTLY (ties impossible under a unique id), with no window
    * function and no per-group sort — one hash aggregation whose state
    * is five scalars per bar, map-side combinable. The value sum runs
    * in exact DECIMAL internally (double summation is
    * order-dependent; decimal is associative) and lands as the
    * repo-standard rounded DOUBLE. */
  def ohlcBars(events: DataFrame, minutes: Int,
               keyCol: String = "event_type", tsCol: String = "ts",
               idCol: String = "event_id",
               valueCol: String = "value"): DataFrame =
    events
      .groupBy(
        window(col(tsCol), s"$minutes minutes").getField("start").as("bucket_start"),
        col(keyCol))
      .agg(
        min_by(col(valueCol), struct(col(tsCol), col(idCol))).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), struct(col(tsCol), col(idCol))).as("close"),
        count(lit(1)).as("n"),
        round(sum(col(valueCol).cast("decimal(18,2)")).cast("double"), 2).as("total_value"))

  /** First-order Markov transition matrix over per-entity event
    * streams: count (from → to) transitions between CONSECUTIVE events
    * of the same entity (ts, id order) and normalize per source state.
    * The behavioral-model / next-event-prediction primitive.
    *
    * The lead() window partitions by the HIGH-cardinality entity key —
    * per-partition sorts distribute across the cluster (ex17's
    * low-cardinality hazard does not apply). Probabilities are exact
    * integer ratios rounded to 6 — bitwise cross-engine. The per-state
    * total comes from a second tiny aggregation over the (from, to)
    * count table (states² rows), NOT a global window over the pair
    * stream. Output: (from_type, to_type, n, p). */
  def transitionMatrix(events: DataFrame, keyCol: String, tsCol: String,
                       idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val cnt = events
      .select(col(keyCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy(col("from_type")).agg(sum(col("n")).as("__t"))
    cnt.join(tot, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("__t"), 6).as("p"))
  }

  /** EX-08: JSON field extraction from a string column. `get_json_object`
    * is codegen'd; for fixed wide schemas prefer `from_json` once. */
  /** Histogram quantile sketch: per-group fixed-width bin counts →
    * quantile = upper edge of the first bin whose cumulative count
    * reaches ⌈q·n⌉. The approximate-percentile shape for 100 TB —
    * exact interpolated percentiles (ex09) need the group's full value
    * multiset in one place (a sort), while the sketch state is ≤
    * range/binWidth longs per group, map-side combinable, mergeable
    * across partitions/batches, and DETERMINISTIC (same answer every
    * run and in any engine — unlike rank-statistic samplers, it
    * hash-checks against an oracle). Error bound: a quantile is off by
    * at most binWidth (spec-pinned vs the exact percentile); pick
    * binWidth = tolerated error. First agg shrinks the corpus to
    * (groups × bins) rows; the cumulative window runs on sketch-sized
    * data only. */
  def histogramQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                         binWidth: Double, qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null values are EXCLUDED (the aggregate-function posture: count
    // over known values) — without the filter they'd pool into a null
    // bin that sorts first and silently shifts every quantile's rank
    val binned = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), floor(col(valueCol) / binWidth).cast("long").as("__bin"))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__bin"))
    val cum = binned
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__n", sum(col("__cnt")).over(Window.partitionBy(col(groupCol))))
    cum.select(col(groupCol), col("__bin"), col("__cum"), col("__n"),
        explode(array(qs.map(lit): _*)).as("q"))
      .filter(col("__cum") >= ceil(col("q") * col("__n")))
      .groupBy(col(groupCol), col("q"))
      .agg(min(col("__bin")).as("__qbin"))
      .select(col(groupCol), col("q"),
        round((col("__qbin") + 1) * binWidth, 6).as("quantile_est"))
  }

  /** Per-group quantile estimates from the [[QuantileBottomK]] sketch —
    * the range-free sibling of [[histogramQuantiles]] (which needs a
    * known value range to pick a bin width). One hash aggregation whose
    * per-group state is ≤ k (hash, value) pairs; the estimate for
    * quantile q is the sample's type-1 order statistic (1-based rank
    * ⌈q·m⌉ over the m ≤ k retained values) — exact when the group fits
    * in k, within O(1/√k) rank error above it, and bit-identical in any
    * engine because the sample is pinned by md5 row-id hashes and the
    * selection rule is pure integer/IEEE arithmetic.
    * Requires `idCol` unique per row (the sample is a function of the
    * id set). Null values are excluded (the aggregate-function
    * posture). Output: (groupCol, q, quantile_est, n_sample). */
  def quantileSketch(events: DataFrame, groupCol: String, idCol: String,
                     valueCol: String, qs: Seq[Double],
                     k: Int = 256): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must lie in (0, 1], got $qs")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val sk = udaf(new QuantileBottomK(k))
    events.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(sk(h, col(valueCol).cast("double")).as("__vs"))
      .select(col(groupCol), explode(array(qs.map(lit): _*)).as("q"), col("__vs"))
      .select(col(groupCol), col("q"),
        round(element_at(col("__vs"),
          greatest(lit(1L), ceil(col("q") * size(col("__vs")))).cast("int")), 6)
          .as("quantile_est"),
        size(col("__vs")).cast("long").as("n_sample"))
  }

  /** Last-touch conversion attribution: every `convType` event is
    * credited to the LATEST preceding `touchTypes` event of the same
    * entity within a `lookbackDays` window, or to the `"direct"`
    * channel when no touch qualifies — the standard event-analytics
    * attribution read (cf. the funnel/cohort family above; this one
    * answers "which channel drove the conversion", not "did the user
    * get there").
    *
    * Shape: touches are first collapsed to one row per (key, ts) —
    * `max_by` on the unique event id, so simultaneous touches resolve
    * deterministically in any engine — then matched by [[asofJoin]]'s
    * union + carry-forward window: ONE shuffle keyed by the entity id,
    * O((T+C) log) per key, never the O(T·C) per-key range join. The
    * lookback is applied AFTER the as-of match as a plain column
    * predicate (the carried touch is the latest one, so "latest touch
    * inside the window" ≡ "latest touch, if inside the window").
    * A touch at exactly the conversion's timestamp counts (asofJoin's
    * <= semantics). Output: the conversion rows plus a non-null
    * `channel` column. */
  def attributeLastTouch(events: DataFrame, keyCol: String, tsCol: String,
                         idCol: String, typeCol: String,
                         touchTypes: Seq[String], convType: String,
                         lookbackDays: Int): DataFrame = {
    require(lookbackDays >= 1, s"lookbackDays must be >= 1, got $lookbackDays")
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(convType),
      s"conversion type '$convType' cannot also be a touch type")
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .groupBy(col(keyCol), col(tsCol))
      .agg(max_by(col(typeCol), col(idCol)).as("touch_channel"))
    val conv = events.filter(col(typeCol) === convType)
    asofJoin(conv, touches, keyCol, tsCol, Seq("touch_channel"), "__t_")
      .withColumn("channel",
        when(col(s"__t_$tsCol") >=
            col(tsCol) - expr(s"INTERVAL $lookbackDays DAYS"),
          col("__t_touch_channel")).otherwise(lit("direct")))
      .drop(s"__t_$tsCol", "__t_touch_channel")
  }

  def jsonExtractAgg(events: DataFrame): DataFrame =
    events
      // try_cast, not cast: under ANSI mode (Spark 4 default) a plain
      // cast would throw on non-numeric k; both sides count parse-OK rows.
      .withColumn("k_val", get_json_object(col("props"), "$.k").try_cast("long"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k_val")).as("sum_k"),
        count(col("k_val")).as("n_with_k"))
}
