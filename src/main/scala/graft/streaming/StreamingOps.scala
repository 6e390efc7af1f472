package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming variants of the batch event operators
  * ([[graft.operators.EventOps]]) — same semantics under a watermark
  * (SURVEY EX-01..03 streaming forms), plus a custom stateful
  * sessionizer built on `flatMapGroupsWithState` for semantics the
  * built-in `session_window` can't express (per-session event counts
  * with custom merge state, emitted exactly once on watermark close).
  *
  * Scale: state is per-key and bounded (open sessions only); watermark
  * eviction keeps the state store from growing with stream length. All
  * aggregations are incremental — no batch re-scan.
  */
object StreamingOps {

  /** Typed event row for the stateful operators. */
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)

  /** A closed session (emitted once, append-mode). */
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  /** Open-session state: epoch-ms bounds + event count. */
  private[graft] case class OpenSession(start: Long, last: Long, n: Long)

  /** EX-01 streaming: tumbling window aggregation under a watermark.
    * Same output shape as the batch [[graft.operators.EventOps.tumblingAgg]];
    * append-mode emission happens when the watermark passes window end. */
  def tumblingAgg(events: DataFrame, minutes: Int, watermarkDelay: String): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), s"$minutes minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("total_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("total_value"))

  /** EX-02 streaming: built-in session windows under a watermark. */
  def sessionAgg(events: DataFrame, gapMinutes: Int, watermarkDelay: String): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window").getField("start").as("session_start"),
        col("session_window").getField("end").as("session_end"),
        col("n_events"))

  /** EX-03 streaming: keyed dedup with bounded state — duplicates are
    * dropped as long as they arrive within the watermark delay of the
    * first occurrence; state for older keys is evicted. */
  def dedupEvents(events: DataFrame, watermarkDelay: String): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom stateful sessionization: per-user open sessions merged with
    * the same closed-boundary gap rule as `session_window` (an event
    * exactly gap-after the previous one merges — pinned in
    * EventOpsSpec), emitted exactly once when the watermark passes
    * session end. State per key = open sessions only. */
  def statefulSessions(events: Dataset[Ev], gapMinutes: Int,
                       watermarkDelay: String): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[OpenSession], Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[List[OpenSession]]) =>
          val wm = state.getCurrentWatermarkMs()
          val existing = state.getOption.getOrElse(Nil)
          val merged = mergeAll(existing, it.map(_.ts.getTime).toList, gapMs)
          // A session is closed once the watermark is strictly past its
          // end: a new event at exactly session end would still merge.
          val (closed, open) = merged.partition(s => s.last + gapMs < wm)
          if (open.nonEmpty) {
            state.update(open)
            state.setTimeoutTimestamp(math.max(open.map(_.last + gapMs).min, wm + 1))
          } else state.remove()
          closed.iterator.map(s =>
            Session(uid, new Timestamp(s.start), new Timestamp(s.last + gapMs), s.n))
      }
  }

  /** Streaming KMV estimate row (update mode: latest per key wins). */
  case class KmvEstimate(event_type: String, est_users: Double)

  /** 60-bit md5-derived hash — the same family as the batch
    * [[graft.operators.EventOps.kmvDistinctUsers]], host-side. */
  private[graft] def kmvHash(u: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    java.lang.Long.parseLong(
      md.digest(u.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
  }

  /** EX-04c streaming: KMV distinct estimator with BOUNDED state — at
    * most k longs per key, ever (vs exact streaming distinct whose
    * state grows with cardinality). Each micro-batch unions the new
    * hashes into the bottom-k set and re-takes k; that update rule is
    * correct because KMV is mergeable (bottom-k of shard unions =
    * bottom-k of the whole — the PropertySpec invariant), so the
    * estimate converges to the batch value regardless of how events
    * were split across micro-batches. Emits the refreshed estimate for
    * every key seen in the batch (update output mode). */
  def kmvDistinctUsers(events: Dataset[Ev], k: Int = 64): Dataset[KmvEstimate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .mapGroupsWithState[List[Long], KmvEstimate](GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Ev], state: GroupState[List[Long]]) =>
          val incoming = it.map(e => kmvHash(e.user_id)).toList
          val bottom = (state.getOption.getOrElse(Nil) ++ incoming)
            .distinct.sorted.take(k)
          state.update(bottom)
          val est =
            if (bottom.length < k) bottom.length.toDouble
            // BigDecimal.valueOf = shortest-decimal representation of the
            // double, matching Spark's round() in the batch operator —
            // BigDecimal(double) (exact binary expansion) can tie-round
            // the 6th decimal differently on the same estimate.
            else BigDecimal.valueOf((k - 1).toDouble * math.pow(2, 60) / bottom.last)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          KmvEstimate(key, est)
      }
  }

  /** One count-min-sketch cell (mirrors the batch sketch's schema). */
  case class CmsCell(row: Int, bucket: Long, cnt: Long)

  /** Streaming count-min sketch over `events`' event_type keys: state
    * is ONE long per touched (row, bucket) cell — at most depth·width
    * entries forever, regardless of stream length or key cardinality.
    * Keying the stateful operator BY CELL (not by sketch row) keeps
    * parallelism at up-to-depth·width tasks instead of depth. Cell
    * counts are SUMS, so adding each micro-batch's cells is exactly
    * mergeable: the streaming sketch equals the batch
    * [[graft.operators.EventOps.cmsSketch]] over the same prefix on
    * ANY micro-batch split (spec-pinned). Null keys are excluded on
    * both variants (values-only, the KMV posture). Emits the refreshed
    * cells touched in the batch (update output mode). */
  def cmsSketch(events: Dataset[Ev], depth: Int = 4,
                width: Int = 256): Dataset[CmsCell] = {
    import events.sparkSession.implicits._
    events.mapPartitions { it =>
      // one digest per partition, not per element
      val md = java.security.MessageDigest.getInstance("MD5")
      def bucket(i: Int, key: String): Long = {
        md.reset()
        java.lang.Long.parseLong(
          md.digest(s"${i}_$key".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(15), 16) % width
      }
      it.filter(_.event_type != null)
        .flatMap(e => (0 until depth).map(i => (i, bucket(i, e.event_type))))
    }
      .groupByKey(identity)
      .mapGroupsWithState[Long, CmsCell](GroupStateTimeout.NoTimeout) {
        (cell: (Int, Long), it: Iterator[(Int, Long)], state: GroupState[Long]) =>
          val c = state.getOption.getOrElse(0L) + it.size
          state.update(c)
          CmsCell(cell._1, cell._2, c)
      }
  }

  /** Streaming histogram sketch — the stateful form of
    * [[graft.operators.EventOps.histogramQuantiles]]'s first stage:
    * per (group, bin) running counts, keyed BY CELL like [[cmsSketch]]
    * (parallelism = live cells, state = one long per cell, bounded by
    * groups × range/binWidth forever). Bin counts are SUMS, so the
    * streaming sketch equals the batch bin counts over the same prefix
    * on ANY micro-batch split (spec-pinned); quantiles finalize from
    * the emitted cells with the batch rule (upper edge at ⌈q·n⌉). */
  case class HistCell(group: String, bin: Long, cnt: Long)
  def histSketch(events: Dataset[Ev], binWidth: Double): Dataset[HistCell] = {
    import events.sparkSession.implicits._
    events.filter(_.event_type != null)
      .map(e => (e.event_type, math.floor(e.value / binWidth).toLong))
      .groupByKey(identity)
      .mapGroupsWithState[Long, HistCell](GroupStateTimeout.NoTimeout) {
        (cell: (String, Long), it: Iterator[(String, Long)], state: GroupState[Long]) =>
          val c = state.getOption.getOrElse(0L) + it.size
          state.update(c)
          HistCell(cell._1, cell._2, c)
      }
  }

  /** Stream-stream interval join: each left event matched to right
    * events of the same key with `r.ts ∈ [l.ts, l.ts + maxLag]`. Both
    * sides carry watermarks and the time bound is part of the join
    * condition, so Spark can evict buffered state once the watermark
    * passes `ts + maxLag` — without the bound the state store grows
    * with the whole stream. */
  def streamIntervalJoin(left: DataFrame, right: DataFrame, key: String,
                         maxLagMinutes: Int, watermarkDelay: String): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay).as("l")
    val r = right.withWatermark("ts", watermarkDelay).as("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col("r.ts") >= col("l.ts") &&
        col("r.ts") <= col("l.ts") + expr(s"INTERVAL $maxLagMinutes MINUTES"))
  }

  /** Streaming sink with the OP-31 invariant: every micro-batch of a
    * complete-mode aggregation is published as a full new VERSION via
    * [[graft.sinks.Publish]] (atomic manifest flip), so downstream
    * readers only ever see a complete, consistent snapshot — never a
    * half-written batch. With `checkpoint` set the query (offsets AND
    * aggregation state) survives a crash: on restart the last
    * uncommitted batch re-runs and republishes its version
    * IDEMPOTENTLY (overwrite staging + same manifest target), so the
    * invariant holds across failures, not just between them. Returns
    * the started query. */
  def publishSnapshots(aggregated: DataFrame, root: String, table: String,
                       checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = aggregated.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.sinks.Publish.publishTables(
          batch.sparkSession, Map(table -> batch.toDF()), root, f"$id%06d")
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** Ingest versions are `v-<9-digit batch id>` with an optional
    * maintenance suffix (`-c<k>` from [[graft.sinks.Lake
    * .compactPublished]]): the digits IDENTIFY the last folded batch,
    * the suffix keeps maintenance republishes lexicographically newer
    * without claiming a new batch. */
  // \d{9,}: a batch id >= 1e9 widens the f"%09d" padding; a fixed {9}
  // would parse it to None and disable the replay guard for that id.
  // Safe on BOTH consumers of version names: this replay guard
  // compares digits numerically (`digits.toLong`), and Publish.vacuum
  // / Lake.compactPublished order versions via Publish.versionOrdering
  // (digits-as-value, not lexicographic), so the width rollover cannot
  // make a concurrent publisher's wider in-flight staging dir sort
  // "older" than _CURRENT and become vacuum-eligible mid-stage.
  private val IngestVersion = """^v-(\d{9,})(-.*)?$""".r

  /** The last batch id folded into an ingest root, judged from the
    * PUBLISHED version only (`_CURRENT`), never from directory
    * listings: `Publish.publishTables` stages `v-<id>` BEFORE the
    * manifest flip, so a hard crash (kill/OOM) in that window leaves an
    * orphan staged dir whose digits equal the replayed batch id — a
    * listing-based guard would see it and skip the replay, silently
    * losing the batch from the fold state. `_CURRENT` only ever names a
    * COMPLETELY published version, so parsing it cannot over-claim. The
    * IngestVersion regex tolerates the `-c<k>` compaction suffix (which
    * preserves the digits), and a version in a foreign format (not
    * written by this ingest or its compaction) parses to None — the
    * guard then never skips, which is the safe direction (refolding is
    * guarded by this very check on the NEXT restart; skipping loses
    * data forever). */
  private def lastFoldedBatch(s: org.apache.spark.sql.SparkSession,
                              root: String): Option[Long] =
    graft.sinks.Publish.currentVersion(s, root)
      .collect { case IngestVersion(digits, _) => digits.toLong }

  /** Shared ingest skeleton (dedup/SCD2/CDC): per micro-batch —
    * idempotent-replay guard, bootstrap-or-read state, fold, atomic
    * snapshot publish.
    *
    * The guard: foreachBatch is at-least-once — a crash after
    * publishTables succeeds but before the checkpoint commits re-runs
    * the SAME batch id on restart, and folding it twice corrupts the
    * state (duplicate/relabeled rows). A published ingest version with
    * digits >= this batch id proves the batch already folded — skip.
    * COROLLARY: restarting WITHOUT a checkpoint resets batch ids to 0
    * while the root still holds higher versions, so every batch is
    * skipped until ids pass the old maximum — always set `checkpoint`
    * for a resumable stream, or start a fresh root. */
  private def guardedFold(changes: DataFrame, root: String, table: String,
                          checkpoint: Option[String])(
      bootstrap: DataFrame => DataFrame)(
      fold: (DataFrame, DataFrame, Long) => DataFrame): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = changes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val s = batch.sparkSession
        if (!lastFoldedBatch(s, root).exists(_ >= id)) {
          val existing = graft.sinks.Publish.currentVersion(s, root) match {
            case Some(_) => graft.sinks.Publish.readTable(s, root, table)
            case None => bootstrap(batch.toDF())
          }
          graft.sinks.Publish.publishTables(s,
            Map(table -> fold(existing, batch.toDF(), id)), root, f"$id%09d")
        }
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** Streaming incremental corpus dedup — the ingest form of
    * [[graft.operators.NearDup.canonicalizeIncremental]]: each
    * micro-batch of documents joins the established near-dup clusters
    * (existing assignments never relabeled), and the updated mapping
    * snapshot — (id, canonical_id, text), text kept because future
    * batches re-shingle the cluster representatives — is republished
    * atomically per batch through the stage-and-swap manifest, so a
    * crash mid-batch leaves the previous complete mapping current and
    * the checkpoint replays the batch (the OP-31 invariant on
    * streaming state; replays of already-folded batches are no-ops —
    * see [[guardedFold]]). The pipeline IS the fold of
    * canonicalizeIncremental over the batch sequence; the first batch
    * folds over an empty mapping. Contract: ids are ingested at most
    * once across the stream (dedupe upstream with
    * dropDuplicatesWithinWatermark if the source can repeat ids) —
    * a re-ingested id would duplicate its mapping row. */
  def dedupIngest(docs: DataFrame, root: String, idCol: String, textCol: String,
                  checkpoint: Option[String] = None,
                  threshold: Double = 0.5): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.functions.col
    guardedFold(docs, root, "mapping", checkpoint)(
      batch => batch.select(col(idCol), col(idCol).as("canonical_id"),
        col(textCol)).limit(0)) { (existing, batch, _) =>
      graft.operators.NearDup.canonicalizeIncremental(
        existing, batch, idCol, textCol, threshold = threshold)
        // re-attach text so the next batch can re-shingle reps
        .join(existing.select(col(idCol), col(textCol))
          .unionByName(batch.select(col(idCol), col(textCol))), Seq(idCol))
    }
  }

  /** Streaming SCD2 ingest: a stream of dimension-update batches folds
    * into a published type-2 history via [[graft.operators.Scd2.merge]]
    * — each micro-batch closes changed rows, inserts new versions, and
    * republishes the FULL history atomically (stage-and-swap), so
    * readers always see a complete consistent history and a crash
    * mid-batch leaves the previous version current. Batch dates come
    * from `batchDateOf(batchId)` so replays are deterministic. The
    * same idempotent-foreachBatch guard as [[dedupIngest]]: a replay
    * of an already-published batch id is a no-op. Updates within one
    * batch must be unique per key (dedupe upstream —
    * [[graft.operators.Dedup.firstWins]]); the LAST published history
    * is the fold state, so the state size is the history, not the
    * stream. */
  def scd2Ingest(updates: DataFrame, root: String, key: String,
                 trackedCols: Seq[String],
                 batchDateOf: Long => java.sql.Date,
                 checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.functions.lit
    guardedFold(updates, root, "history", checkpoint)(
      // bootstrap: empty history with the SCD2 meta columns
      batch => batch
        .withColumn("valid_from", lit(null).cast("date"))
        .withColumn("valid_to", lit(null).cast("date"))
        .withColumn("is_current", lit(true))
        .limit(0)) { (existing, batch, id) =>
      graft.operators.Scd2.merge(existing, batch, key, trackedCols, batchDateOf(id))
    }
  }

  /** Streaming CDC ingest — the type-1 sibling of [[scd2Ingest]]: each
    * micro-batch of I/U/D changes folds through
    * [[graft.operators.Cdc.apply]] into a published current-state
    * snapshot (stage-and-swap; a crash leaves the previous complete
    * snapshot current; replays of published batch ids are no-ops). The
    * within-batch op order is the caller's `seqCol`; ACROSS batches
    * order is batch order — the usual CDC-log contract. */
  def cdcIngest(changes: DataFrame, root: String, key: String, seqCol: String,
                checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.functions.col
    guardedFold(changes, root, "snapshot", checkpoint)(
      batch => batch.select(batch.columns
        .filterNot(c => c == graft.operators.Cdc.OpCol || c == seqCol)
        .map(col).toSeq: _*).limit(0)) { (existing, batch, _) =>
      graft.operators.Cdc.apply(existing, batch, key, seqCol)
    }
  }

  /** Streaming maintenance of the stored ANN bucket index: each
    * micro-batch of embeddings lands via
    * [[graft.operators.Similarity.writeIndexBatch]] — dynamic
    * partition overwrite into `(bucket, ingest_batch=<id>)`
    * directories. Unlike the publish-based ingests above, idempotence
    * here needs NO replay guard and NO version manifest: a replayed
    * batch id rewrites exactly its own `ingest_batch` partitions with
    * identical rows (streaming sources replay deterministically), so
    * at-least-once delivery converges, and a crash mid-write is
    * repaired by the replay. The trade: readers get per-directory
    * (eventual) visibility rather than snapshot isolation — right for
    * an ANN index whose answers are approximate by contract; use the
    * Publish-versioned ingests when readers need atomic snapshots.
    * Query with [[graft.operators.Similarity.bucketedTopKStored]]
    * (the extra partition level projects away; bucket stays top-level
    * so partition pruning is unaffected); fold the accumulated batch
    * level away periodically with
    * [[graft.operators.Similarity.compactStoredBuckets]]. */
  def annIndexIngest(vectors: DataFrame, indexPath: String,
                     numPlanes: Int = 8, dim: Int = 64,
                     checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.operators.Similarity.writeIndexBatch(
          batch.toDF(), indexPath, id, numPlanes, dim)
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** Streaming materialized JOIN-view maintenance — the ingest form of
    * [[graft.operators.IncrementalRollup.joinViewDelta]]: one tagged
    * stream carries append batches for BOTH join inputs (`sideCol` =
    * "L"/"R"; union two sources upstream), and each micro-batch folds
    *
    *   ΔV = ΔL ⋈ R_acc  ∪  L_acc ⋈ ΔR  ∪  ΔL ⋈ ΔR
    *
    * into the view's mergeable rollup state, republished atomically
    * per batch (stage-and-swap; same idempotent replay guard as
    * [[dedupIngest]] — a replayed batch id is a no-op). The base-⋈-base
    * join never executes: per batch the SHUFFLE is delta-matched and
    * the published state is viewKeys-sized.
    *
    * Side accumulations are append-only batch-id-named parquet dirs
    * (`side_l/batch-<id>`, overwritten on replay — idempotent), so the
    * per-batch side WRITE is delta-sized; the delta terms re-READ the
    * accumulated opposite side, which at 100 TB you bound by laying
    * the side dirs out bucketed on the join key
    * ([[graft.sinks.Bucketed]]) so each delta join prunes to its key
    * buckets. A crash between the side write and the publish replays
    * the batch: the side dirs rewrite byte-identically (accumulation
    * reads only dirs with id < current, so a half-written current dir
    * is never read as history) and the publish proceeds.
    *
    * Consumers read
    * `IncrementalRollup.finalize(Publish.readTable(s, root,
    * "view_state"), viewKeys)`. Append-only contract as
    * [[graft.operators.IncrementalRollup.joinViewDelta]]. */
  def joinViewIngest(tagged: DataFrame, root: String, sideCol: String,
                     lCols: Seq[String], rCols: Seq[String],
                     joinKeys: Seq[String], viewKeys: Seq[String],
                     valueCol: String,
                     checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.IncrementalRollup
    val w = tagged.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val s = batch.sparkSession
        if (!lastFoldedBatch(s, root).exists(_ >= id)) {
          val lDelta = batch.filter(col(sideCol) === "L").select(lCols.map(col): _*)
          val rDelta = batch.filter(col(sideCol) === "R").select(rCols.map(col): _*)
          val lAcc = readSideBefore(s, s"$root/side_l", id, lDelta)
          val rAcc = readSideBefore(s, s"$root/side_r", id, rDelta)
          lDelta.write.mode("overwrite").parquet(f"$root/side_l/batch-$id%09d")
          rDelta.write.mode("overwrite").parquet(f"$root/side_r/batch-$id%09d")
          val dv = IncrementalRollup.state(
            IncrementalRollup.joinViewDelta(lAcc, lDelta, rAcc, rDelta, joinKeys),
            viewKeys, valueCol)
          val prior = graft.sinks.Publish.currentVersion(s, root) match {
            case Some(_) => graft.sinks.Publish.readTable(s, root, "view_state")
            case None    => dv.limit(0)
          }
          graft.sinks.Publish.publishTables(s,
            Map("view_state" -> IncrementalRollup.merge(prior, dv, viewKeys)),
            root, f"$id%09d")
        }
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** All side batches folded BEFORE `beforeId` (exclusive — a replayed
    * current batch's half-written dir must never read as history);
    * `template.limit(0)` when none exist yet. */
  private def readSideBefore(s: org.apache.spark.sql.SparkSession, dir: String,
                             beforeId: Long, template: DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    // \d{9,}: ids >= 1e9 widen the f"%09d" padding — a fixed {9} would
    // silently DROP them from accumulated history (data loss, not an
    // error). Ordering is numeric (`d.toLong`), so width never matters.
    val B = """^batch-(\d{9,})$""".r
    val prior =
      if (!fs.exists(p)) Seq.empty[String]
      else fs.listStatus(p).toSeq.filter(_.isDirectory)
        .flatMap(_.getPath match {
          case path => path.getName match {
            case B(d) if d.toLong < beforeId => Some(path.toString)
            case _ => None
          }
        })
    if (prior.isEmpty) template.limit(0) else s.read.parquet(prior: _*)
  }

  /** Merge sorted-by-start open sessions with a batch of event times
    * under the closed-boundary gap rule (`next <= last + gap` merges). */
  private[graft] def mergeAll(sessions: List[OpenSession], eventTs: List[Long],
                              gapMs: Long): List[OpenSession] = {
    val units = sessions ++ eventTs.map(t => OpenSession(t, t, 1L))
    units.sortBy(_.start)
      .foldLeft(List.empty[OpenSession]) { (acc, u) =>
        acc match {
          case prev :: rest if u.start <= prev.last + gapMs =>
            OpenSession(prev.start, math.max(prev.last, u.last), prev.n + u.n) :: rest
          case _ => u :: acc
        }
      }.reverse
  }
}
