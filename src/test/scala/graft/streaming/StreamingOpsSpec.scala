package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import StreamingOps.Ev

/** MemoryStream-driven specs: each op runs as a real streaming query
  * with watermarks; a far-future sentinel event advances the watermark
  * so append-mode results flush deterministically. */
class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private val farFuture = Ev(999L, ts("2026-06-01 00:00:00"), 999L, "sentinel", 0.0)

  private def runStream[T](name: String)(build: MemoryStream[Ev] => org.apache.spark.sql.DataFrame)
                          (batches: Seq[Seq[Ev]]): Array[org.apache.spark.sql.Row] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = build(input).writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).collect()
    } finally q.stop()
  }

  test("streaming tumblingAgg matches batch semantics after watermark close") {
    val events = Seq(
      Ev(1L, ts("2026-01-01 10:00:00"), 1L, "click", 1.5),
      Ev(2L, ts("2026-01-01 10:02:00"), 1L, "click", 2.5),
      Ev(3L, ts("2026-01-01 10:07:00"), 2L, "view", 4.0))
    val rows = runStream("t_tumble")(in =>
      StreamingOps.tumblingAgg(in.toDF(), 5, "1 minute"))(
      Seq(events, Seq(farFuture)))
    val got = rows.map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got.contains(("2026-01-01 10:00:00.0", "click", 2L, 4.0)))
    assert(got.contains(("2026-01-01 10:05:00.0", "view", 1L, 4.0)))
  }

  test("streaming sessionAgg emits closed sessions with batch-equal bounds") {
    val events = Seq(
      Ev(1L, ts("2026-01-01 10:00:00"), 1L, "a", 0.0),
      Ev(2L, ts("2026-01-01 10:10:00"), 1L, "a", 0.0), // exact gap: merges
      Ev(3L, ts("2026-01-01 11:00:00"), 1L, "a", 0.0)) // separate session
    val rows = runStream("t_sess")(in =>
      StreamingOps.sessionAgg(in.toDF(), 10, "1 minute"))(
      Seq(events, Seq(farFuture)))
    val got = rows.filter(_.getLong(0) == 1L)
      .map(r => (r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3))).toSet
    assert(got.contains(("2026-01-01 10:00:00.0", "2026-01-01 10:20:00.0", 2L)))
    assert(got.contains(("2026-01-01 11:00:00.0", "2026-01-01 11:10:00.0", 1L)))
  }

  test("dedupEvents drops within-watermark duplicate event_ids") {
    val events = Seq(
      Ev(1L, ts("2026-01-01 10:00:00"), 1L, "a", 1.0),
      Ev(1L, ts("2026-01-01 10:00:30"), 1L, "a", 1.0), // dup id
      Ev(2L, ts("2026-01-01 10:01:00"), 1L, "a", 2.0))
    val rows = runStream("t_dedup")(in =>
      StreamingOps.dedupEvents(in.toDF(), "10 minutes"))(
      Seq(events, Seq(farFuture)))
    val ids = rows.map(_.getLong(0)).toSeq.sorted
    assert(ids == Seq(1L, 2L, 999L))
  }

  test("statefulSessions: closed-boundary merge, exactly-once emission on close") {
    val events = Seq(
      Ev(1L, ts("2026-01-01 10:00:00"), 1L, "a", 0.0),
      Ev(2L, ts("2026-01-01 10:10:00"), 1L, "a", 0.0), // exact gap: merges
      Ev(3L, ts("2026-01-01 10:25:00"), 1L, "a", 0.0), // > gap: new session
      Ev(4L, ts("2026-01-01 10:05:00"), 2L, "b", 0.0))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingOps.statefulSessions(input.toDS(), 10, "1 minute")
      .writeStream.format("memory").queryName("t_state").outputMode("append").start()
    try {
      input.addData(events); q.processAllAvailable()
      input.addData(Seq(farFuture)); q.processAllAvailable()
      // one more batch so timeouts fired by the advanced watermark emit
      input.addData(Seq(farFuture.copy(event_id = 1000L,
        ts = ts("2026-06-01 01:00:00")))); q.processAllAvailable()
      val got = spark.table("t_state").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3)))
        .toSet
      assert(got.contains((1L, "2026-01-01 10:00:00.0", "2026-01-01 10:20:00.0", 2L)))
      assert(got.contains((1L, "2026-01-01 10:25:00.0", "2026-01-01 10:35:00.0", 1L)))
      assert(got.contains((2L, "2026-01-01 10:05:00.0", "2026-01-01 10:15:00.0", 1L)))
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped from closed windows") {
    val rows = runStream("t_late")(in =>
      StreamingOps.tumblingAgg(in.toDF(), 5, "1 minute"))(Seq(
      Seq(Ev(1L, ts("2026-01-01 10:00:00"), 1L, "click", 1.0)),
      // advances watermark far past the 10:00 window and closes it
      Seq(Ev(2L, ts("2026-01-01 12:00:00"), 1L, "click", 1.0)),
      // late event for the already-closed 10:00 window: must be dropped
      Seq(Ev(3L, ts("2026-01-01 10:01:00"), 1L, "click", 100.0)),
      // flush remaining windows
      Seq(farFuture)))
    val tenOClock = rows.filter(_.getTimestamp(0).toString == "2026-01-01 10:00:00.0")
    assert(tenOClock.length == 1)
    assert(tenOClock.head.getLong(2) == 1L, "late event must not be counted")
    assert(tenOClock.head.getDouble(3) == 1.0)
  }

  test("publishSnapshots: each micro-batch becomes a complete atomic version") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_stream_pub")
      .toFile.getAbsolutePath
    val input = MemoryStream[Ev]
    val counts = input.toDF().groupBy("event_type").count()
    val q = StreamingOps.publishSnapshots(counts, root, "counts")
    try {
      input.addData(Seq(Ev(1L, ts("2026-01-01 10:00:00"), 1L, "a", 0.0)))
      q.processAllAvailable()
      input.addData(Seq(
        Ev(2L, ts("2026-01-01 10:01:00"), 1L, "a", 0.0),
        Ev(3L, ts("2026-01-01 10:02:00"), 2L, "b", 0.0)))
      q.processAllAvailable()
      val cur = graft.sinks.Publish.currentVersion(spark, root)
      assert(cur.isDefined && cur.get >= "v-000001") // latest batch won
      val out = graft.sinks.Publish.readTable(spark, root, "counts")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out == Map("a" -> 2L, "b" -> 1L)) // complete snapshot
    } finally q.stop()
  }

  test("publishSnapshots: killed and resumed from checkpoint keeps the OP-31 invariant") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_crash_pub")
      .toFile.getAbsolutePath
    val ckpt = java.nio.file.Files.createTempDirectory("graft_crash_ckpt")
      .toFile.getAbsolutePath
    val input = MemoryStream[Ev]
    val counts = input.toDF().groupBy("event_type").count()

    val q1 = StreamingOps.publishSnapshots(counts, root, "counts", Some(ckpt))
    val (v1, out1) = try {
      input.addData(Seq(
        Ev(1L, ts("2026-01-01 10:00:00"), 1L, "a", 0.0),
        Ev(2L, ts("2026-01-01 10:01:00"), 2L, "b", 0.0)))
      q1.processAllAvailable()
      (graft.sinks.Publish.currentVersion(spark, root).get,
        graft.sinks.Publish.readTable(spark, root, "counts")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    } finally q1.stop() // the crash
    assert(out1 == Map("a" -> 1L, "b" -> 1L))

    // while down, the manifest still resolves to the complete old version
    assert(graft.sinks.Publish.currentVersion(spark, root).contains(v1))
    assert(graft.sinks.Publish.readTable(spark, root, "counts")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == out1)

    // resume the SAME query from the checkpoint: offsets and aggregation
    // state must carry over (complete mode re-emits recovered keys)
    input.addData(Seq(Ev(3L, ts("2026-01-01 10:02:00"), 3L, "a", 0.0)))
    val q2 = StreamingOps.publishSnapshots(counts, root, "counts", Some(ckpt))
    try {
      q2.processAllAvailable()
      val v2 = graft.sinks.Publish.currentVersion(spark, root).get
      assert(v2 > v1, s"restart must publish a NEW version ($v1 -> $v2)")
      val out2 = graft.sinks.Publish.readTable(spark, root, "counts")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out2 == Map("a" -> 2L, "b" -> 1L),
        "aggregation state must survive the restart (b was only in batch 1)")
      // the published version is a COMPLETE write, not a torn one
      assert(new java.io.File(s"$root/$v2/counts/_SUCCESS").exists,
        "current version must carry the commit marker")
    } finally q2.stop()
  }

  test("streamIntervalJoin matches right events within the lag window only") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lIn = MemoryStream[Ev]
    val rIn = MemoryStream[Ev]
    val joined = StreamingOps.streamIntervalJoin(
      lIn.toDF().select($"event_id".as("l_id"), $"user_id", $"ts"),
      rIn.toDF().select($"event_id".as("r_id"), $"user_id", $"ts"),
      "user_id", 10, "1 minute")
      .select($"l_id", $"r_id")
    val q = joined.writeStream.format("memory").queryName("t_ssj")
      .outputMode("append").start()
    try {
      lIn.addData(Seq(Ev(1L, ts("2026-01-01 10:00:00"), 1L, "l", 0.0)))
      rIn.addData(Seq(
        Ev(10L, ts("2026-01-01 10:05:00"), 1L, "r", 0.0), // within lag
        Ev(11L, ts("2026-01-01 10:20:00"), 1L, "r", 0.0), // beyond lag
        Ev(12L, ts("2026-01-01 10:05:00"), 2L, "r", 0.0), // other key
        Ev(13L, ts("2026-01-01 09:59:00"), 1L, "r", 0.0))) // before left
      q.processAllAvailable()
      lIn.addData(Seq(farFuture)); rIn.addData(Seq(farFuture))
      q.processAllAvailable()
      val got = spark.table("t_ssj").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.filter(_._1 == 1L) == Set((1L, 10L)))
    } finally q.stop()
  }

  test("streaming KMV converges to the batch estimate across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val allUsers = (1L to 500L).toSeq
    def ev(u: Long) = Ev(u, ts("2026-01-01 10:00:00"), u, "click", 1.0)
    val input = MemoryStream[Ev]
    val q = StreamingOps.kmvDistinctUsers(input.toDS(), 64).writeStream
      .format("memory").queryName("t_kmv").outputMode("update").start()
    try {
      // arbitrary micro-batch split, with overlap (re-sent users)
      input.addData(allUsers.take(300).map(ev)); q.processAllAvailable()
      input.addData(allUsers.drop(200).map(ev)); q.processAllAvailable()
      val streamed = spark.table("t_kmv").collect()
        .map(r => r.getDouble(1)).last // update mode: last row is current
      val batch = graft.operators.EventOps.kmvDistinctUsers(
        allUsers.map(u => ("click", u)).toDF("event_type", "user_id"), 64)
        .collect().head.getDouble(1)
      assert(streamed == batch,
        s"streamed=$streamed batch=$batch — mergeability must make them equal")
    } finally q.stop()
  }

  test("streaming CMS equals the batch sketch regardless of micro-batching") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(i: Long, t: String) = Ev(i, ts("2026-01-01 10:00:00"), i, t, 0.0)
    val all = (1L to 40L).map(i => ev(i, s"k${i % 7}"))
    val input = MemoryStream[Ev]
    val q = StreamingOps.cmsSketch(input.toDS(), depth = 4, width = 32)
      .writeStream.format("memory").queryName("t_cms").outputMode("update").start()
    try {
      // arbitrary uneven micro-batch split
      input.addData(all.take(13)); q.processAllAvailable()
      input.addData(all.drop(13).take(20)); q.processAllAvailable()
      input.addData(all.drop(33)); q.processAllAvailable()
      // update mode re-emits refreshed cells; counts only grow, so the
      // final state of each cell is its MAX emission
      val streamed = spark.table("t_cms").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .groupBy(_._1).map { case (cell, vs) => cell -> vs.map(_._2).max }
      val batch = graft.operators.EventOps.cmsSketch(
        all.map(_.event_type).toDF("term"), "term", 4, 32)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batch,
        "additive cells must make the streaming sketch equal the batch sketch")
    } finally q.stop()
  }

  test("streaming histogram sketch equals batch bin counts; quantiles finalize identically") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(i: Long, t: String, v: Double) = Ev(i, ts("2026-01-01 10:00:00"), i, t, v)
    val all = (1L to 60L).map(i => ev(i, s"t${i % 3}", (i * 7 % 50) + 0.5))
    val input = MemoryStream[Ev]
    val q = StreamingOps.histSketch(input.toDS(), binWidth = 5.0)
      .writeStream.format("memory").queryName("t_hist").outputMode("update").start()
    try {
      input.addData(all.take(17)); q.processAllAvailable()
      input.addData(all.drop(17).take(25)); q.processAllAvailable()
      input.addData(all.drop(42)); q.processAllAvailable()
      // counts only grow → final cell state = max emission
      val streamed = spark.table("t_hist").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .groupBy(_._1).map { case (c, vs) => c -> vs.map(_._2).max }
      val batch = all.map(e => (e.event_type, e.value)).toDF("event_type", "value")
        .groupBy($"event_type",
          org.apache.spark.sql.functions.floor($"value" / 5.0).cast("long").as("bin"))
        .count().collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batch,
        "additive bins must make the streaming sketch equal the batch bin counts")
      // finalizing quantiles from the streamed cells reproduces the
      // batch histogramQuantiles answer exactly
      val cells = streamed.toSeq.map { case ((g, b), c) => (g, b, c) }
        .toDF("event_type", "bin", "cnt")
      val qs = Seq(0.5, 0.95)
      val fromStream = {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        val w = Window.partitionBy($"event_type").orderBy($"bin")
        cells.withColumn("cum", sum($"cnt").over(w))
          .withColumn("n", sum($"cnt").over(Window.partitionBy($"event_type")))
          .select($"event_type", $"cum", $"n", $"bin",
            explode(array(qs.map(lit): _*)).as("q"))
          .filter($"cum" >= ceil($"q" * $"n"))
          .groupBy($"event_type", $"q").agg(min($"bin").as("qb"))
          .select($"event_type", $"q", round(($"qb" + 1) * 5.0, 6).as("quantile_est"))
          .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      }
      val fromBatch = graft.operators.EventOps.histogramQuantiles(
          all.map(e => (e.event_type, e.value)).toDF("event_type", "value"),
          "event_type", "value", 5.0, qs)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      assert(fromStream == fromBatch)
    } finally q.stop()
  }

  test("stratifiedMix is stateless-streaming-safe and equals its batch result") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val rates = Map("en" -> 2.5, "zh" -> 0.5)
    val q = graft.operators.Sampling
      .stratifiedMix(input.toDF().toDF("id", "lang"), "id", "lang", rates, 1.0)
      .writeStream.format("memory").queryName("t_mix").outputMode("append").start()
    val data = (1L to 200L).map(i => (i, Seq("en", "zh", "de")(i.toInt % 3)))
    try {
      // arbitrary micro-batch split: pure projection ⇒ split-invariant
      input.addData(data.take(77)); q.processAllAvailable()
      input.addData(data.drop(77)); q.processAllAvailable()
      val got = spark.table("t_mix").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted.toSeq
      val want = graft.operators.Sampling
        .stratifiedMix(data.toDF("id", "lang"), "id", "lang", rates, 1.0)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted.toSeq
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("scd2Ingest folds dimension updates into a published type-2 history") {
    import graft.sinks.Publish
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_scd2_ingest").toString
    val d = (id: Long) => java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(id))
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.scd2Ingest(
      input.toDF().toDF("k", "v"), root, "k", Seq("v"), d)
    try {
      input.addData(Seq((1L, "a"), (2L, "b"))); q.processAllAvailable()
      input.addData(Seq((1L, "a2"), (3L, "c"))); q.processAllAvailable()
    } finally q.stop()

    assert(Publish.currentVersion(spark, root).contains("v-000000001"))
    val hist = Publish.readTable(spark, root, "history")
      .select($"k", $"v", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, String, java.sql.Date, Option[java.sql.Date], Boolean)]
      .collect().toSet
    assert(hist == Set(
      (1L, "a", d(0), Some(d(1)), false),  // closed by batch 1
      (1L, "a2", d(1), None, true),
      (2L, "b", d(0), None, true),         // untouched across batch 1
      (3L, "c", d(1), None, true)))

    // previous snapshot still complete for pinned readers
    assert(spark.read.parquet(s"$root/v-000000000/history").count() == 2)
  }

  test("cdcIngest folds I/U/D batches into a published current-state snapshot") {
    import graft.sinks.Publish
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_ingest").toString
    val input = MemoryStream[(Long, String, String, Long)]
    val q = StreamingOps.cdcIngest(
      input.toDF().toDF("k", "v", "op", "seq"), root, "k", "seq")
    try {
      input.addData(Seq((1L, "a", "I", 1L), (2L, "b", "I", 2L)))
      q.processAllAvailable()
      input.addData(Seq((1L, "a2", "U", 1L), (2L, "b", "D", 2L), (3L, "c", "I", 3L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = Publish.readTable(spark, root, "snapshot")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a2"), (3L, "c")))
    // batch-0 snapshot still readable for pinned readers
    assert(spark.read.parquet(s"$root/v-000000000/snapshot").count() == 2)
  }

  test("ingest replay guard survives an out-of-band compaction (digits preserved)") {
    import graft.sinks.{Lake, Publish}
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_compact").toString
    val input = MemoryStream[(Long, String, String, Long)]
    val q = StreamingOps.cdcIngest(
      input.toDF().toDF("k", "v", "op", "seq"), root, "k", "seq")
    try {
      input.addData(Seq((1L, "a", "I", 1L))); q.processAllAvailable()
      // ops compacts the ingest root between batches — the maintenance
      // version keeps batch digits and adds -c1, so the NEXT batch must
      // still fold (an arbitrary newer version would make it skip)
      val cur = Publish.currentVersion(spark, root).get
      val cv = Lake.ingestCompactVersion(cur)
      assert(cv == "000000000-c1")
      Lake.compactPublished(spark, root, "snapshot", Seq(col("k")), Seq("k"),
        newVersion = cv, numFiles = 1)
      assert(Publish.currentVersion(spark, root).contains("v-000000000-c1"))
      input.addData(Seq((2L, "b", "I", 1L))); q.processAllAvailable()
    } finally q.stop()
    val got = Publish.readTable(spark, root, "snapshot")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b")),
      "batch after compaction must fold, not be skipped by the replay guard")
  }

  test("replay guard refolds a batch whose crashed publish left an orphan staged dir") {
    import graft.sinks.Publish
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_orphan").toString
    val input = MemoryStream[(Long, String, String, Long)]
    val q = StreamingOps.cdcIngest(
      input.toDF().toDF("k", "v", "op", "seq"), root, "k", "seq")
    try {
      input.addData(Seq((1L, "a", "I", 1L))); q.processAllAvailable()
      // Simulate a hard crash (kill/OOM) inside publishTables' stage→flip
      // window for the NEXT batch: v-000000001 exists fully staged, but
      // _CURRENT still names v-000000000 — publishTables' exception
      // cleanup never ran. The replayed batch id 1 must fold anyway; a
      // listing-based guard sees digits 1 >= 1 and silently loses it.
      Seq((99L, "ghost")).toDF("k", "v")
        .write.parquet(s"$root/v-000000001/snapshot")
      assert(Publish.currentVersion(spark, root).contains("v-000000000"))
      input.addData(Seq((2L, "b", "I", 1L))); q.processAllAvailable()
    } finally q.stop()
    assert(Publish.currentVersion(spark, root).contains("v-000000001"))
    val got = Publish.readTable(spark, root, "snapshot")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b")),
      "batch staged by a crashed publish must refold on replay, not be skipped")
  }

  test("cdcIngest drops null-key changes instead of accumulating unremovable rows") {
    import graft.sinks.Publish
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_null").toString
    val input = MemoryStream[(Option[Long], String, String, Long)]
    val q = StreamingOps.cdcIngest(
      input.toDF().toDF("k", "v", "op", "seq"), root, "k", "seq")
    try {
      input.addData(Seq((Some(1L), "a", "I", 1L), (None, "junk", "U", 2L)))
      q.processAllAvailable()
      input.addData(Seq((None, "junk2", "U", 1L), (Some(2L), "b", "I", 2L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = Publish.readTable(spark, root, "snapshot")
      .as[(Option[Long], String)].collect().toSet
    assert(got == Set((Some(1L), "a"), (Some(2L), "b")))
  }

  test("dedupIngest folds incremental dedup over micro-batches, snapshots atomically") {
    import graft.operators.NearDup
    import graft.sinks.Publish
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.dedupIngest(
      input.toDF().toDF("doc_id", "text"), root, "doc_id", "text")
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different content about spark aggregation plans"))
    val b2 = Seq(
      (4L, "the quick brown fox jumps over the lazy dog tonight"), // joins cluster 1
      (5L, "another new unrelated document streaming in later on"))
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val got = Publish.readTable(spark, root, "mapping")
      .select($"doc_id", $"canonical_id").as[(Long, Long)].collect().toMap
    // reference: the explicit fold of canonicalizeIncremental
    val e0 = Seq.empty[(Long, Long, String)].toDF("doc_id", "canonical_id", "text")
    val m1 = NearDup.canonicalizeIncremental(e0, b1.toDF("doc_id", "text"), "doc_id", "text")
      .join(b1.toDF("doc_id", "text"), Seq("doc_id"))
    val m2 = NearDup.canonicalizeIncremental(m1, b2.toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc_id", $"canonical_id").as[(Long, Long)].collect().toMap
    assert(got == m2)
    assert(got(4L) == got(1L), "cross-batch near-dup must join the existing cluster")
    assert(got(5L) == 5L, "unlinked newcomer forms its own cluster")
    assert(got(1L) == got(2L))
  }

  test("joinViewIngest: mixed/one-sided batches fold to the full rejoin exactly") {
    import graft.operators.IncrementalRollup
    import graft.sinks.Publish
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_jvi").toString
    val input = MemoryStream[(String, Long, String, Double)]
    val q = StreamingOps.joinViewIngest(
      input.toDF().toDF("side", "k", "g", "value"), root, "side",
      lCols = Seq("k", "g"), rCols = Seq("k", "value"),
      joinKeys = Seq("k"), viewKeys = Seq("g"), valueCol = "value")
    try {
      // b1: both sides, in-batch match (ΔL⋈ΔR term)
      input.addData(Seq(("L", 1L, "a", 0.0), ("L", 2L, "b", 0.0), ("R", 1L, "", 1.0)))
      q.processAllAvailable()
      // b2: R-only batch (L⋈ΔR against accumulated L)
      input.addData(Seq(("R", 1L, "", 2.0), ("R", 2L, "", 4.0)))
      q.processAllAvailable()
      // b3: new L row joining old+new R (ΔL⋈R and L⋈ΔR and ΔL⋈ΔR)
      input.addData(Seq(("L", 3L, "a", 0.0), ("R", 3L, "", 8.0), ("R", 1L, "", 16.0)))
      q.processAllAvailable()
    } finally q.stop()
    def fin(st: org.apache.spark.sql.DataFrame) =
      IncrementalRollup.finalize(st, Seq("g"))
        .select($"g", $"n", $"total").as[(String, Long, Double)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val got = fin(Publish.readTable(spark, root, "view_state"))
    val full = fin(IncrementalRollup.state(
      Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("k", "g")
        .join(Seq((1L, 1.0), (1L, 2.0), (2L, 4.0), (3L, 8.0), (1L, 16.0))
          .toDF("k", "value"), Seq("k")),
      Seq("g"), "value"))
    assert(got == full)
    assert(got("a") == ((4L, 27.0)) && got("b") == ((1L, 4.0)))
  }

  test("annIndexIngest: streamed index equals batch build; replayed batch converges") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val indexPath = java.nio.file.Files.createTempDirectory("graft_ann_ingest").toString
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.annIndexIngest(
      input.toDF().toDF("vec_id", "embedding"), indexPath)
    try {
      Seq(emb.take(150), emb.slice(150, 300), emb.drop(300)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    // streamed index answers exactly like the all-at-once build
    val full = java.nio.file.Files.createTempDirectory("graft_ann_full").toString
    Similarity.writeBucketedCorpus(
      emb.toSeq.toDF("vec_id", "embedding"), full)
    val queries = emb.take(10).toSeq.toDF("vec_id", "embedding")
    val a = Similarity.bucketedTopKStored(spark, indexPath, queries, 5).collect().toSet
    val b = Similarity.bucketedTopKStored(spark, full, queries, 5).collect().toSet
    assert(a == b, "streamed index diverges from batch build")
    // at-least-once replay: rewriting an already-ingested batch id with
    // the same rows (the streaming-source replay contract) must leave
    // the index row-for-row identical — dynamic partition overwrite
    // replaces that batch's own directories, never duplicating
    val before = spark.read.parquet(indexPath)
      .groupBy($"vec_id").count().as[(Long, Long)].collect().toMap
    Similarity.writeIndexBatch(
      emb.slice(150, 300).toSeq.toDF("vec_id", "embedding"), indexPath, 1L)
    val after = spark.read.parquet(indexPath)
      .groupBy($"vec_id").count().as[(Long, Long)].collect().toMap
    assert(after == before, "replayed batch changed the index")
    assert(after.values.forall(_ == 1L), "every vector indexed exactly once")
    // the batch level folds away under compaction, results intact
    val compacted = java.nio.file.Files.createTempDirectory("graft_ann_comp").toString
    Similarity.compactStoredBuckets(spark, indexPath, compacted)
    assert(!spark.read.parquet(compacted).columns.contains("ingest_batch"))
    assert(Similarity.bucketedTopKStored(spark, compacted, queries, 5).collect().toSet == a)
  }

  test("streaming quantileSketch (complete mode) equals the batch sketch on the same events") {
    // The QuantileBottomK Aggregator is a semilattice, so incremental
    // micro-batch aggregation must land on the SAME sketch — and hence
    // the same quantile rows — as one batch pass over all events.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = (1 to 300).map { i =>
      Ev(i.toLong, ts("2026-01-01 10:00:00"), i.toLong % 7,
        if (i % 2 == 0) "click" else "view", (i * 13 % 101).toDouble)
    }
    val input = MemoryStream[Ev]
    val q = graft.operators.EventOps.quantileSketch(
        input.toDF(), "event_type", "event_id", "value", Seq(0.5, 0.9), 64)
      .writeStream.format("memory").queryName("t_qsketch")
      .outputMode("complete").start()
    try {
      events.grouped(90).foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("t_qsketch").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSet
      val batch = graft.operators.EventOps.quantileSketch(
          events.toDF(), "event_type", "event_id", "value", Seq(0.5, 0.9), 64)
        .collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSet
      assert(streamed == batch,
        s"streaming sketch diverged:\n  streamed=$streamed\n  batch=$batch")
    } finally q.stop()
  }

  test("mergeAll unit: merge rules and counts") {
    import StreamingOps.{mergeAll, OpenSession}
    val gap = 600000L // 10 min
    val t0 = 0L
    // exact-gap merges; gap+1ms splits
    assert(mergeAll(Nil, List(t0, t0 + gap), gap) == List(OpenSession(t0, t0 + gap, 2)))
    assert(mergeAll(Nil, List(t0, t0 + gap + 1), gap) ==
      List(OpenSession(t0, t0, 1), OpenSession(t0 + gap + 1, t0 + gap + 1, 1)))
    // out-of-order events + existing state bridge-merge
    assert(mergeAll(List(OpenSession(t0 + gap * 2, t0 + gap * 2, 1)),
      List(t0 + gap, t0), gap) == List(OpenSession(t0, t0 + gap * 2, 3)))
  }
}
