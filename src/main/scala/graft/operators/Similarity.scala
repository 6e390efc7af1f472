package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (ArrayType(FloatType)): brute-force cosine top-k as the exact
  * baseline, and sign-random-projection (hyperplane) LSH bucketing as
  * the 100 TB path — candidates are restricted to the query's bucket,
  * turning O(n·q) into O(q · bucket_size).
  *
  * All arithmetic is double-precision column expressions (zip_with +
  * aggregate) inside codegen; similarities are rounded to 6 decimals and
  * ranked with a vec_id tiebreak so results are deterministic across
  * engines and summation orders.
  */
object Similarity {

  private def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Σ aᵢ·bᵢ over two equal-length arrays — the native codegen
    * [[graft.plans.ArrayDot]] expression (registered by
    * [[graft.plans.GraftExtensions]]). Bit-identical to [[dotHof]],
    * which it replaces in the hot loops: higher-order functions are
    * interpreted per element, a custom expression stays inside
    * whole-stage codegen. */
  def dot(a: Column, b: Column): Column = call_function("graft_array_dot", a, b)

  /** The HOF formulation of [[dot]] — kept as the executable spec of
    * the expression's semantics (SimilaritySpec asserts equality). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Scale-adaptive parallelism floor for CPU-heavy vector scoring
    * over a corpus whose scan plans fewer partitions than the session
    * parallelism (one small unsplittable file — the fixture shape).
    * No-op at production scan widths; see [[NearDup.fanOut]]. */
  private def fanOut(df: DataFrame): DataFrame = NearDup.fanOut(df)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine for each query vector (brute force — the
    * correctness baseline; broadcast the small query set, one pass over
    * the corpus, per-query top-k via window). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = fanOut(corpus).crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"), col("rk").cast("long").as("rk"))
  }

  /** Deterministic pseudo-random hyperplanes: component (p,d) derived
    * from md5("<p>_<d>") — reproducible in any engine with md5, which is
    * what makes the LSH bucketing oracle-checkable. Range ≈ [-1, 1]. */
  def planeWeight(p: Int, d: Int): Double = {
    val mdigest = java.security.MessageDigest.getInstance("MD5")
    val hex = mdigest.digest(s"${p}_$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    ((java.lang.Long.parseLong(hex, 16) % 2001) - 1000).toDouble / 1000.0
  }

  /** [[planeWeight]]'s numerator as an exact integer (w = k/1000 ⇒ k):
    * for INTEGER-valued vectors the sign test Σ v·k ≥ 0 stays in long
    * arithmetic — md5-derived rational planes DO hit exactly zero on
    * integer inputs, where float summation order flips the bit between
    * engines (the dd17 sf0.1 lesson). */
  def planeWeightInt(p: Int, d: Int): Long = math.round(planeWeight(p, d) * 1000)

  /** Sign-random-projection bucket id: bit p = (v · plane_p >= 0);
    * bucket = Σ bit_p << p. Pure projection — no shuffle. */
  def lshBucket(emb: Column, numPlanes: Int, dim: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      val plane = typedLit((0 until dim).map(d => planeWeight(p, d)))
      when(dot(emb, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _).cast("long")
  }

  /** Bucketed approximate top-k: queries only scored against corpus
    * vectors in the same hyperplane bucket. Recall < 1 by construction;
    * the 100 TB path (bucket column becomes the partition/bucketing key
    * of the stored corpus, so a query touches one bucket's files). */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                   numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val cb = fanOut(corpus).withColumn("bucket", lshBucket(col("embedding"), numPlanes, dim))
    val qb = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .withColumn("bucket", lshBucket(col("q_emb"), numPlanes, dim))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"), col("rk").cast("long").as("rk"))
  }

  /** Multi-probe LSH probe set (Lv et al. 2007, arXiv publication of
    * the perturbation idea; here the single-bit-flip variant): probe 0
    * is the query's own bucket, probe i flips the hyperplane with the
    * i-th smallest |margin| — the planes the query sits closest to are
    * the ones most likely to have split it from a near neighbor. The
    * margin ranking is rounded to 6 decimals with a plane-id tiebreak,
    * so the probe set is deterministic and oracle-checkable. Returns
    * an array of `nprobe` DISTINCT bucket ids (flipping different bits
    * always yields different buckets). Measured on the i.i.d. fixture
    * (recall@10, 50 queries): 0.118 (nprobe 1) → 0.136 (2) → 0.162
    * (4) → 0.188 (8); cost grows with probed-bucket volume, i.e.
    * ~nprobe/2^planes of the corpus. */
  def lshProbeBuckets(emb: Column, numPlanes: Int, dim: Int, nprobe: Int): Column = {
    require(nprobe >= 1 && nprobe <= numPlanes + 1,
      s"nprobe must be in [1, numPlanes+1]: $nprobe")
    val base = lshBucket(emb, numPlanes, dim)
    if (nprobe == 1) array(base)
    else {
      val margins = (0 until numPlanes).map { p =>
        val plane = typedLit((0 until dim).map(d => planeWeight(p, d)))
        struct(round(abs(dot(emb, plane)), 6).as("m"), lit(p).as("p"))
      }
      val weakest = array_sort(array(margins: _*)) // (m asc, p asc)
      val flips = (0 until nprobe - 1).map { i =>
        // 2^p via pow — exact in double for p < 53, cast back to long
        base.bitwiseXOR(
          pow(lit(2.0), element_at(weakest, i + 1).getField("p")).cast("long"))
      }
      array((base +: flips): _*)
    }
  }

  /** Materialize the corpus PARTITIONED BY its LSH bucket — the stored
    * half of the bucketed-ANN design: at 100 TB the bucket id is the
    * directory key, so a query's scan touches only its bucket's files.
    * One pure-projection pass (lshBucket is shuffle-free); parquet
    * `partitionBy` lays each bucket out as its own directory. */
  def writeBucketedCorpus(corpus: DataFrame, path: String,
                          numPlanes: Int = 8, dim: Int = 64,
                          metaCols: Seq[String] = Nil): Unit = {
    fanOut(corpus.select((Seq("vec_id", "embedding") ++ metaCols).map(col): _*))
      .withColumn("bucket", lshBucket(col("embedding"), numPlanes, dim))
      // Cluster by bucket before the partitioned write: without it every
      // task writes a file into every bucket directory (tasks × 2^planes
      // small files); with it each bucket's rows land in one task → one
      // file per bucket per write — the layout a 100 TB reader wants.
      // The partition count is pinned to the bucket count (one task per
      // bucket): an N-less repartition is AQE-coalescible, and on a
      // small input AQE folds the whole write into ONE task that then
      // creates all 2^planes files serially (measured 3.5 s vs 1.4 s
      // for this write at sf0.1 — guide §2.4/§6 small-file commit
      // overhead is per-file and serial within a task).
      .repartition(1 << numPlanes, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    writeStats(corpus.sparkSession, path, collectCounts(
      corpus.select(lshBucket(col("embedding"), numPlanes, dim).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_vectors"))))
  }

  /** Per-bucket cardinality/size manifest of a stored bucket index
    * (`<path>/_stats`: bucket, n_vectors, n_bytes) — emitted at
    * write/append/compact time so a HOT LSH bucket is visible from one
    * tiny metadata read instead of being discovered at query time (or
    * via a 100 TB file listing). Underscore-prefixed like `_centroids`,
    * so index scans never see it. n_vectors is exact and
    * oracle-checkable (ann03f); n_bytes comes from an O(buckets)
    * driver-side directory listing of files this writer just produced. */
  def bucketStats(spark: org.apache.spark.sql.SparkSession,
                  path: String): DataFrame =
    spark.read.parquet(s"$path/$StatsName")

  /** [[bucketStats]] with a drift check in front: the manifest's
    * per-bucket byte totals are compared against a FRESH directory
    * listing (O(buckets) namenode calls, never a data read). A clean
    * manifest lists identical bytes — every manifest writer records
    * the post-write listing — so any difference means the manifest
    * missed data: a crash between an append's data write and its
    * manifest write, a concurrent append losing the read-merge-write
    * race (out of [[appendToStoredBuckets]]'s single-writer contract,
    * but detected rather than trusted), or streaming
    * [[writeIndexBatch]] ingest that deliberately defers manifest
    * maintenance to compaction. On drift the manifest is REBUILT
    * authoritatively from the index itself (the same rescan the
    * missing-manifest branch runs) and rewritten, so the returned
    * frame is always consistent with the data on disk. Between
    * streaming micro-batches that rescan recurs — capacity reports
    * over a live streaming index should run after compaction, as the
    * maintenance protocol already schedules. */
  def bucketStatsVerified(spark: org.apache.spark.sql.SparkSession,
                          path: String): DataFrame = {
    val statsPath = new org.apache.hadoop.fs.Path(s"$path/$StatsName")
    val fs = statsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def manifestBytes: Option[Map[Long, Long]] =
      if (!fs.exists(statsPath)) None
      else Some(bucketStats(spark, path)
        .select(col("bucket"), col("n_bytes")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    if (!manifestBytes.contains(listBucketBytes(spark, path))) {
      rebuildStats(spark, path)
      // Convergence check (round-17 ADVICE): a rebuild reconciles the
      // manifest with the listing by construction ([[writeStats]] now
      // carries listing-only buckets as zero-count rows), so a SECOND
      // mismatch means something is mutating the index concurrently or
      // the filesystem listing is unstable — fail loudly instead of
      // silently re-triggering the full O(corpus) rescan on every call.
      val after = listBucketBytes(spark, path)
      if (!manifestBytes.contains(after)) throw new IllegalStateException(
        s"bucketStatsVerified: manifest at $path/$StatsName still drifts " +
          s"from the directory listing after an authoritative rebuild — " +
          s"concurrent writer or unstable listing; listing=$after")
    }
    bucketStats(spark, path)
  }

  /** The buckets a capacity planner cares about: n_vectors above
    * `threshold`, largest first — the skew report that decides caps,
    * probe budgets, and re-hash decisions BEFORE queries hit the
    * index. Reads through [[bucketStatsVerified]]: a report promoted
    * as the planning source of truth must not silently serve a
    * drifted manifest. */
  def hotBuckets(spark: org.apache.spark.sql.SparkSession, path: String,
                 threshold: Long): DataFrame =
    bucketStatsVerified(spark, path).filter(col("n_vectors") > threshold)
      .orderBy(col("n_vectors").desc, col("bucket").asc)

  private val StatsName = "_stats"

  /** Authoritative manifest rebuild from the index data itself — the
    * recovery path for a missing or drifted `_stats`. One count-only
    * scan of the index (column-pruned to the partition column). */
  private def rebuildStats(spark: org.apache.spark.sql.SparkSession,
                           path: String): Unit =
    writeStats(spark, path, collectCounts(spark.read.parquet(path)
      .groupBy(col("bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_vectors"))))

  private def writeStats(spark: org.apache.spark.sql.SparkSession,
                         path: String, counts: Map[Long, Long]): Unit = {
    // The manifest is bucket-count bounded (≤ 2^planes rows), so the
    // byte-listing merge happens DRIVER-SIDE — the guarded-collect
    // class of k-means centroids.
    val bytes = listBucketBytes(spark, path)
    // Listing-only buckets (a bucket dir whose files hold zero data
    // rows — e.g. a crashed write's leftovers) are carried as
    // zero-count rows: byte totals then always reconcile with the
    // listing, so [[bucketStatsVerified]]'s drift check CONVERGES
    // after one rebuild instead of rescanning the index forever.
    val rows = (counts.keySet ++ bytes.keySet).toSeq.sorted.map { b =>
      (b, counts.getOrElse(b, 0L), bytes.getOrElse(b, 0L))
    }
    // Written DIRECTLY with the parquet-hadoop writer on the driver
    // (round 18): the rows are already a driver-side map, and routing
    // them through a one-partition Spark write paid a full job +
    // commit protocol per index write (~0.3-0.5 s of fixed overhead ×
    // build/append/compact). spark.read.parquet reads the file
    // identically (same schema: three required INT64s).
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(s"$path/$StatsName")
    val fs = dir.getFileSystem(conf)
    fs.delete(dir, true)
    fs.mkdirs(dir)
    val schema = org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      "message stats { required int64 bucket; required int64 n_vectors; " +
        "required int64 n_bytes; }")
    val gconf = new org.apache.hadoop.conf.Configuration(conf)
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(schema, gconf)
    val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile
        .fromPath(new org.apache.hadoop.fs.Path(dir, "part-00000.parquet"), gconf))
      .withConf(gconf)
      .build()
    val factory = new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
    try rows.foreach { case (b, n, nb) =>
      w.write(factory.newGroup()
        .append("bucket", b).append("n_vectors", n).append("n_bytes", nb))
    } finally w.close()
  }

  /** Bounded collect of per-bucket counts: ≤ 2^numPlanes rows. */
  private def collectCounts(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** (bucket → total file bytes) from one directory listing per bucket
    * dir — O(2^planes) namenode calls, never a data read. */
  private def listBucketBytes(spark: org.apache.spark.sql.SparkSession,
                              path: String): Map[Long, Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Map.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .map { d =>
        val b = d.getPath.getName.stripPrefix("bucket=").toLong
        b -> fs.listStatus(d.getPath).map(_.getLen).sum
      }.toMap
  }

  /** Incremental maintenance of the stored bucket index: a batch of
    * new vectors is bucketed with the SAME hyperplanes and appended in
    * place. Parquet append + `partitionBy` writes files ONLY into the
    * directories of buckets the batch actually hits — untouched
    * buckets keep their exact files (spec-pinned), so maintaining a
    * 100 TB index costs O(batch), never O(corpus), and readers of
    * other buckets are undisturbed. Pairs with the incremental dedup
    * ingest: dedup incrementally, index incrementally, no rebuilds.
    * Queries via [[bucketedTopKStored]] see old ∪ new immediately
    * (ann03c proves parity with the all-at-once build against ann03's
    * oracle).
    *
    * SINGLE-WRITER contract: the `_stats` maintenance below is a
    * read-merge-write with no coordination — two concurrent appenders
    * interleaving it lose one batch's counts permanently, and a crash
    * between the data append and the manifest write leaves the
    * manifest behind the data. Run appends from one writer at a time
    * (the streaming ingest already serializes micro-batches; batch
    * pipelines publish through [[graft.sinks.Publish]]'s one-writer
    * versions). Both failure shapes are DETECTABLE after the fact:
    * the manifest's recorded bytes no longer match the directory
    * listing, which [[bucketStatsVerified]] checks and repairs with
    * an authoritative index rescan — so consumers of the stats
    * ([[hotBuckets]]) self-heal rather than trust the contract. */
  def appendToStoredBuckets(newVectors: DataFrame, path: String,
                            numPlanes: Int = 8, dim: Int = 64): Unit = {
    newVectors.select(col("vec_id"), col("embedding"))
      .withColumn("bucket", lshBucket(col("embedding"), numPlanes, dim))
      // bucket-count partitions, not AQE-coalesced — see
      // [[writeBucketedCorpus]]'s write comment.
      .repartition(1 << numPlanes, col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(path)
    // Stats maintenance is O(batch ∪ buckets), never O(corpus): the
    // batch's counts (ONE agg job, bounded collect) merge into the
    // existing manifest driver-side — untouched buckets' rows carry
    // over verbatim (spec-pinned). An index predating the manifest
    // (no _stats) gets one authoritative rebuild from the index
    // itself.
    val spark = newVectors.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/$StatsName"))) {
      val batchCounts = collectCounts(newVectors
        .select(lshBucket(col("embedding"), numPlanes, dim).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_vectors")))
      val old = collectCounts(
        bucketStats(spark, path).select(col("bucket"), col("n_vectors")))
      writeStats(spark, path, (old.keySet ++ batchCounts.keySet).map(b =>
        b -> (old.getOrElse(b, 0L) + batchCounts.getOrElse(b, 0L))).toMap)
    } else rebuildStats(spark, path)
  }

  /** One ingest batch of the STREAMING index-maintenance path
    * ([[graft.streaming.StreamingOps.annIndexIngest]]): vectors are
    * bucketed with the index's hyperplanes and written via DYNAMIC
    * partition overwrite into `(bucket, ingest_batch)` partitions.
    * Idempotence comes from the LAYOUT, not a replay guard: a replayed
    * batch id rewrites exactly its own `ingest_batch=<id>` directories
    * with identical content (streaming sources replay the same rows
    * for the same id), so at-least-once delivery converges to
    * exactly-once state — and a crash mid-write is repaired by the
    * replay overwriting the same partitions. `bucket` stays the
    * top-level directory, so query-side dynamic partition pruning is
    * unaffected; [[compactStoredBuckets]] folds the batch level away.
    *
    * Stats note: this streaming path deliberately does NOT touch the
    * `_stats` manifest per micro-batch (a replayed batch would
    * double-merge counts — the manifest write is not idempotent the
    * way the dynamic-partition data write is); the manifest refreshes
    * authoritatively at [[compactStoredBuckets]] time, which the
    * streaming maintenance protocol already schedules.
    */
  def writeIndexBatch(vectors: DataFrame, path: String, batchId: Long,
                      numPlanes: Int = 8, dim: Int = 64): Unit =
    vectors.select(col("vec_id"), col("embedding"))
      .withColumn("bucket", lshBucket(col("embedding"), numPlanes, dim))
      .withColumn("ingest_batch", lit(batchId))
      // bucket-count partitions, not AQE-coalesced — see
      // [[writeBucketedCorpus]]'s write comment.
      .repartition(1 << numPlanes, col("bucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket", "ingest_batch").parquet(path)

  /** Compaction for an append-maintained bucket index: every
    * [[appendToStoredBuckets]] batch adds files, and scan cost is
    * per-file, so an append-heavy index degrades the same way a
    * streaming lake table does. One clustered rewrite restores the
    * one-file-per-bucket layout into `dest` (a NEW path — visibility
    * flips belong to the caller's catalog/manifest protocol, as in
    * [[graft.sinks.Publish]]; compacting in place would race live
    * readers). Results are layout-invariant: ann03d hash-matches the
    * same oracle as ann03/ann03b/ann03c. */
  def compactStoredBuckets(spark: org.apache.spark.sql.SparkSession,
                           src: String, dest: String,
                           numBuckets: Int = 256): Unit = {
    spark.read.parquet(src)
      .select(col("vec_id"), col("embedding"), col("bucket"))
      // bucket-count partitions, not AQE-coalesced — see
      // [[writeBucketedCorpus]]'s write comment.
      .repartition(numBuckets, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(dest)
    writeStats(spark, dest, collectCounts(
      spark.read.parquet(dest).groupBy(col("bucket").cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_vectors"))))
  }

  /** [[bucketedTopK]] against a STORED bucket-partitioned corpus
    * ([[writeBucketedCorpus]]'s layout): the broadcast-hash join on the
    * partition column triggers Spark's dynamic partition pruning, so
    * the corpus scan reads ONLY the buckets the query set hashes into —
    * the claim PlanSpec gates (DynamicPruningExpression in the scan's
    * PartitionFilters). Results are identical to the in-flight
    * [[bucketedTopK]] (ann03's oracle re-checks this form as
    * ann03b). */
  def bucketedTopKStored(spark: org.apache.spark.sql.SparkSession, path: String,
                         queries: DataFrame, k: Int,
                         numPlanes: Int = 8, dim: Int = 64,
                         nprobe: Int = 1,
                         pred: Option[Column] = None): DataFrame = {
    // `pred` = metadata-filtered ANN (the "search within tenant /
    // label / date-range" RAG shape): the predicate lands UNDER the
    // join, so the scan composes BOTH prunings — DPP restricts to the
    // probed buckets' directories AND the row-group predicate pushes
    // into the parquet scan (PushedFilters; PlanSpec-gated). Requires
    // the index written with the metadata columns (`metaCols` on
    // [[writeBucketedCorpus]]). Top-k ranks MATCHING vectors only.
    val corpus = pred.foldLeft(spark.read.parquet(path))(_.filter(_))
    // Partition-column type inference yields IntegerType for the
    // directory values; compute the query bucket in that exact type so
    // the join key needs no cast (a cast on the partition column would
    // defeat the pruning).
    val bucketType = corpus.schema("bucket").dataType
    // nprobe > 1 = multi-probe ([[lshProbeBuckets]]): the query fans
    // out to its probe buckets BEFORE the broadcast, so the one
    // corpus scan DPP-prunes to the union of all probe buckets. A
    // corpus vector lives in exactly one bucket, so probes never
    // double-score it. The generator must be the TOP-LEVEL expression
    // of its projection (Spark rejects explode nested in a cast), so
    // the partition-type cast happens in a second projection — still
    // on the broadcast query side, so pruning is unaffected.
    val qb = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .select(col("query_id"), col("q_emb"),
        explode(lshProbeBuckets(col("q_emb"), numPlanes, dim, nprobe)).as("probe"))
      .select(col("query_id"), col("q_emb"), col("probe").cast(bucketType).as("bucket"))
    val scored = corpus.join(broadcast(qb), Seq("bucket"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"), col("rk").cast("long").as("rk"))
  }

  /** In-flight multi-probe counterpart of [[bucketedTopK]]: queries
    * score every corpus vector in any of their [[lshProbeBuckets]].
    * Same results as the stored form with the same `nprobe` (ann03e
    * checks the stored one against the oracle; SimilaritySpec pins
    * in-flight ≡ stored). */
  def bucketedTopKMultiProbe(corpus: DataFrame, queries: DataFrame, k: Int,
                             numPlanes: Int = 8, dim: Int = 64,
                             nprobe: Int = 4): DataFrame = {
    val cb = fanOut(corpus).withColumn("bucket", lshBucket(col("embedding"), numPlanes, dim))
    val qb = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .withColumn("bucket",
        explode(lshProbeBuckets(col("q_emb"), numPlanes, dim, nprobe)))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"), col("rk").cast("long").as("rk"))
  }

  /** Driver-side materialization of a bounded MODEL table — k centroids
    * or one codebook's K entries, (id, embedding) rows — for the fused
    * literal-model assignment below. Bounded by construction (model
    * tables are k- or m·K-sized, never corpus-sized: the same bound the
    * broadcast variant relied on). Sorted by id for a deterministic
    * expression tree. */
  private def toDoubles(xs: Seq[Any]): Seq[Double] = xs.map {
    case d: Double => d
    case f: Float => f.toDouble // exact — the widening ArrayDot applies
    case other => throw new IllegalArgumentException(
      s"model embeddings must be non-null float/double, got: $other")
  }

  private def modelRows(model: DataFrame, idCol: String,
                        embCol: String): Seq[(Long, Seq[Double])] =
    model.select(col(idCol).cast("long"), col(embCol)).collect()
      .map(r => (r.getLong(0), toDoubles(r.getSeq[Any](1))))
      .sortBy(_._1).toSeq

  /** Fused nprobe=1 assignment expression: argmax over the LITERAL
    * centroid set of round(cosine, 6) with the centroid-id tiebreak —
    * the native [[graft.plans.NearestModelEntry]] expression, one
    * compiled loop per row over the model carried as a boxed literal.
    * Value-identical to the old crossJoin(broadcast) → max_by form
    * (same arithmetic, same nan-safe/null struct ordering — see the
    * expression's scaladoc) but a PURE PROJECTION: no k-way row blowup
    * and no corpus-sized reassembly exchange (guide §2.4). NOT written
    * as k unrolled literal structs or a HOF fold: the former costs a
    * multi-second Janino compile per distinct centroid set, the latter
    * interprets per element — both measured dominating bench-scale
    * inputs. */
  private def nearestCentroid(model: Seq[(Long, Seq[Double])],
                              emb: Column): Column =
    call_function("graft_nearest_cosine", emb, typedlit(model))

  /** IVF assignment to the `n` nearest centroids by cosine (rounded to
    * 6 decimals, centroid-id tiebreak — deterministic). The centroid
    * table is collected (k-sized — the broadcast bound) and inlined as
    * literals, so assignment is a PURE PROJECTION over the vectors: the
    * old crossJoin(broadcast) → hash-agg form shuffled the whole corpus
    * (embeddings included) through the `vec_id` reassembly exchange on
    * every call — k-means paid it per iteration, every index build and
    * append paid it once more (guide §2.4). nprobe=1 ranks via
    * [[nearestCentroid]]; nprobe>1 array_sorts the centroid-bounded
    * (−sim, id) struct list per row — total-ordered (centroid_id is
    * unique), hence deterministic, and value-identical to the old
    * collect_list form. One output row per (vector, probed centroid). */
  def ivfAssignN(vectors: DataFrame, centroids: DataFrame, n: Int): DataFrame = {
    val model = modelRows(centroids, "centroid_id", "c_emb")
    if (model.isEmpty)
      // empty centroid table: the old inner crossJoin produced no rows
      return vectors.select(col("vec_id"),
        lit(null).cast("long").as("centroid_id"), col("embedding"))
        .where(lit(false))
    if (n == 1)
      vectors.select(col("vec_id"),
        nearestCentroid(model, col("embedding")).as("centroid_id"),
        col("embedding"))
    else {
      // n>1 is query-side only (probe sets): a transform over the ONE
      // model literal keeps the generated source model-independent; the
      // per-element interpreted cost is paid on |queries| rows, never
      // the corpus. Element (−round(sim, 6), id) ≡ the old collect_list
      // sort struct.
      val scoredArr = transform(typedlit(model), c =>
        struct((-round(cosine(col("embedding"), c.getField("_2")), 6)).as("s"),
          c.getField("_1").as("centroid_id")))
      val top = slice(array_sort(scoredArr), 1, n)
      vectors.select(col("vec_id"),
        explode(top.getField("centroid_id")).as("centroid_id"),
        col("embedding"))
    }
  }

  /** Nearest-centroid assignment (nprobe=1 special case). */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssignN(vectors, centroids, 1)

  /** Deterministic Lloyd's k-means for IVF centroid training: init =
    * the first `k` corpus vectors, a FIXED number of iterations, and
    * centroid components rounded to 6 decimals after every update — so
    * any engine (the DuckDB oracle included) reproduces the exact same
    * centroids, making the trained index oracle-checkable.
    *
    * Each iteration: assign every vector to its nearest centroid by
    * rounded cosine ([[nearestCentroid]] — centroid-id tiebreak, a pure
    * projection over the literal current centroids), then take the
    * per-dimension mean of each cluster (explode → ONE hash agg, with
    * the 6-decimal round applied in-engine — `round(avg(v), 6)`, the
    * same expression the old plan evaluated after reassembly). The
    * k·dim rounded means are collected (model-sized — the staging bound
    * the old per-iteration localCheckpoint relied on) and merged into
    * the driver-side model; empty clusters keep their previous
    * centroid. Per iteration this runs ONE job over the corpus instead
    * of the old crossJoin → vec_id reassembly exchange → explode → two
    * aggs → join → checkpoint chain (guide §2.4/§1.2). */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    var model: Seq[(Long, Seq[Double])] =
      corpus.filter(col("vec_id") < k)
        .select(col("vec_id").cast("long").as("centroid_id"),
          transform(col("embedding"), x => round(x.cast("double"), 6)).as("c_emb"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
        .sortBy(_._1).toSeq
    for (_ <- 0 until iters if model.nonEmpty) {
      val means = corpus
        .select(nearestCentroid(model, col("embedding")).as("centroid_id"),
          posexplode(col("embedding")).as(Seq("d", "v")))
        .groupBy(col("centroid_id"), col("d"))
        .agg(round(avg(col("v").cast("double")), 6).as("m"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1)
        .map { case (cid, rs) => cid -> rs.sortBy(_._2).map(_._3).toSeq }
      model = model.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    import spark.implicits._
    model.toDF("centroid_id", "c_emb")
  }

  /** IVF-style ANN top-k: the corpus is partitioned into inverted lists
    * by nearest centroid and each query probes only its own centroid's
    * list (nprobe=1). Centroids come from [[kmeansCentroids]]
    * (deterministic Lloyd's; `kmeansIters = 0` degenerates to the
    * first-`numCentroids`-vectors init). The partition/probe machinery
    * is the part that matters at scale: the inverted-list id becomes
    * the storage partition key, so a query touches one partition. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numCentroids: Int = 16, kmeansIters: Int = 2,
              nprobe: Int = 1,
              centsOpt: Option[DataFrame] = None): DataFrame = {
    // centsOpt: reuse an already-trained coarse quantizer — the
    // production shape (one model, many serving calls), and what lets
    // ann07's ladder train each model exactly once
    val cents = centsOpt.getOrElse(kmeansCentroids(corpus, numCentroids, kmeansIters))
    // Corpus lists stay disjoint (nprobe applies to the QUERY side
    // only), so a probed corpus vector is scored exactly once even
    // when a query probes several lists.
    val ca = ivfAssign(fanOut(corpus.select(col("vec_id"), col("embedding"))), cents)
    val qa = ivfAssignN(queries.select(col("vec_id"), col("embedding")), cents, nprobe)
      .select(col("vec_id").as("query_id"), col("centroid_id"),
        col("embedding").as("q_emb"))
    val scored = ca.join(broadcast(qa), Seq("centroid_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"), col("rk").cast("long").as("rk"))
  }

  /** Materialize the corpus as STORED inverted lists: trained k-means
    * centroids ([[kmeansCentroids]] — deterministic), nearest-centroid
    * assignment, then a clustered write PARTITIONED BY `centroid_id` —
    * the IVF counterpart of [[writeBucketedCorpus]]: at 100 TB the
    * inverted-list id is the directory key. The centroid table is
    * written next to the lists (`<path>/_centroids`) so query time
    * never retrains. Returns nothing; query with [[ivfTopKStored]]. */
  def writeIvfCorpus(corpus: DataFrame, path: String,
                     numCentroids: Int = 16, kmeansIters: Int = 2): Unit = {
    val cents = kmeansCentroids(corpus, numCentroids, kmeansIters)
    cents.write.mode("overwrite").parquet(s"$path/_centroids")
    ivfAssign(fanOut(corpus.select(col("vec_id"), col("embedding"))), cents)
      .repartition(col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(s"$path/lists")
  }

  /** Incremental maintenance of the stored IVF index: a batch of new
    * vectors is assigned with the index's OWN centroids (read from
    * `_centroids` — no retraining; the index's partitioning contract
    * is the frozen centroid set) and parquet-appended ONLY into the
    * inverted-list directories the batch lands in — O(batch), never
    * O(corpus), exactly like [[appendToStoredBuckets]]. Periodic
    * retraining is a REBUILD ([[writeIvfCorpus]] to a fresh path +
    * manifest flip), not an append — centroid drift would silently
    * re-partition queries away from old vectors. */
  def appendToIvfCorpus(spark: org.apache.spark.sql.SparkSession,
                        newVectors: DataFrame, path: String): Unit = {
    val cents = spark.read.parquet(s"$path/_centroids")
    ivfAssign(fanOut(newVectors.select(col("vec_id"), col("embedding"))), cents)
      .repartition(col("centroid_id"))
      .write.mode("append").partitionBy("centroid_id").parquet(s"$path/lists")
  }

  /** [[ivfTopK]] against a STORED inverted-list corpus
    * ([[writeIvfCorpus]]'s layout): queries are assigned to their
    * `nprobe` nearest centroids (read from the index's own centroid
    * table — no retraining) and the broadcast equi-join on the
    * partition column dynamically prunes the list scan to the probed
    * centroids' directories, exactly like the LSH path (PlanSpec
    * gates it). Results are identical to the in-flight [[ivfTopK]]
    * with the same constants (ann04b re-checks ann04's oracle). */
  def ivfTopKStored(spark: org.apache.spark.sql.SparkSession, path: String,
                    queries: DataFrame, k: Int, nprobe: Int = 1): DataFrame = {
    val lists = spark.read.parquet(s"$path/lists")
    val cents = spark.read.parquet(s"$path/_centroids")
    val cidType = lists.schema("centroid_id").dataType
    val qa = ivfAssignN(queries.select(col("vec_id"), col("embedding")), cents, nprobe)
      .select(col("vec_id").as("query_id"),
        col("centroid_id").cast(cidType).as("centroid_id"),
        col("embedding").as("q_emb"))
    val scored = lists.join(broadcast(qa), Seq("centroid_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"), col("rk").cast("long").as("rk"))
  }

  /** Long-form subspace split for product quantization: one row per
    * (id, sub) carrying that subspace's `subDim`-dim slice. Pure
    * projection + explode — no shuffle. */
  private def subspaces(df: DataFrame, idCol: String, m: Int, subDim: Int): DataFrame =
    df.select(col(idCol), explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"),
          slice(col("embedding"), s * subDim + 1, subDim).as("sub_emb"))): _*)).as("sv"))
      .select(col(idCol), col("sv.sub").as("sub"), col("sv.sub_emb").as("sub_emb"))

  /** PQ codebook, deterministic sample init: codebook of subspace s =
    * the s-subvectors of the first `codebookSize` corpus vectors,
    * rounded to 6 decimals (k-means refinement is orthogonal and
    * proven in [[kmeansCentroids]]; sample codebooks keep the oracle
    * tractable while exercising the full encode/ADC machinery).
    * Staged — (m·codebookSize) rows, consumed by encode, LUT, and
    * norm branches. */
  def pqCodebook(corpus: DataFrame, m: Int, subDim: Int, codebookSize: Int): DataFrame =
    NearDup.stage(subspaces(corpus.filter(col("vec_id") < codebookSize), "vec_id", m, subDim)
      .select(col("sub"), col("vec_id").as("centroid_id"),
        transform(col("sub_emb"), x => round(x.cast("double"), 6)).as("c_emb")))

  /** Per-subspace codebook entries collected driver-side (m·K-sized —
    * the broadcast bound), sorted by centroid id. */
  private def codebookRows(cb: DataFrame): Map[Int, Seq[(Long, Seq[Double])]] =
    cb.select(col("sub").cast("int"), col("centroid_id").cast("long"),
        col("c_emb")).collect()
      .map(r => (r.getInt(0), (r.getLong(1), toDoubles(r.getSeq[Any](2)))))
      .groupBy(_._1)
      .map { case (s, rs) => s -> rs.map(_._2).sortBy(_._1).toSeq }

  /** PQ encoding: each vector → m codes, code of subspace s = argmax
    * rounded cosine against s's codebook (centroid-id tiebreak). The
    * codebook is inlined as literals ([[nearestCentroid]] per
    * subspace), so the encode is ONE PROJECTION + posexplode — the old
    * subspace-explode → broadcast join (K-way row fan-out) →
    * (vec_id, sub) reassembly exchange is gone (guide §2.4); values
    * are identical (same expressions, same struct-ordering tiebreak).
    * At serving scale this is the corpus compression: dim floats → m
    * small codes per vector. */
  def pqEncode(vectors: DataFrame, codebook: DataFrame, m: Int, subDim: Int): DataFrame = {
    val cb = codebookRows(codebook)
    val codes = (0 until m).map { s =>
      call_function("graft_nearest_cosine",
        slice(col("embedding"), s * subDim + 1, subDim), typedlit(cb(s)))
    }
    vectors.select(col("vec_id"),
      posexplode(array(codes: _*)).as(Seq("sub", "centroid_id")))
  }

  /** One fused L2 assignment pass: each vector's subspace s takes the
    * codebook entry minimizing round(‖v‖² − 2·v·c + ‖c‖², 6) — the
    * three-dot form, mirrored term-for-term by the oracle so the
    * rounded value is bit-stable across engines (a fused
    * Σ(v−c)² associates differently in float). The argmin is the
    * native [[graft.plans.NearestModelEntry]] in L2 mode — exactly the
    * old min_by (d2, centroid_id) sort-struct ordering, one compiled
    * loop per (row, subspace) over the codebook literal.
    * Pure projection + posexplode — no K-way fan-out, no reassembly
    * exchange. Output: every non-embedding input column, then
    * (sub, centroid_id, sub_emb) — for the plain (vec_id, embedding)
    * input that is (vec_id, sub, centroid_id, sub_emb). */
  private def pqAssignL2(vectors: DataFrame,
                         cb: Map[Int, Seq[(Long, Seq[Double])]],
                         m: Int, subDim: Int): DataFrame = {
    val perSub = (0 until m).map { s =>
      val sube = slice(col("embedding"), s * subDim + 1, subDim)
      struct(call_function("graft_nearest_l2", sube, typedlit(cb(s)))
          .as("centroid_id"),
        sube.as("sub_emb"))
    }
    val keep = vectors.columns.filterNot(_ == "embedding").map(col).toSeq
    vectors.select(keep :+
        posexplode(array(perSub: _*)).as(Seq("sub", "__sv")): _*)
      .select(keep ++ Seq(col("sub"),
        col("__sv.centroid_id").as("centroid_id"),
        col("__sv.sub_emb").as("sub_emb")): _*)
  }

  /** K-MEANS-TRAINED PQ codebooks: per-subspace Lloyd's with L2
    * assignment — the textbook PQ objective (minimize quantization
    * error of the reconstruction; ADC's dot-product error is bounded
    * by it). Deterministic exactly like [[kmeansCentroids]]: init =
    * sub-slices of the first `codebookSize` vectors, fixed `iters`,
    * every distance and centroid component rounded to 6 decimals,
    * centroid-id tiebreak, empty clusters keep their previous entry —
    * so the DuckDB oracle reproduces the trained codebook bit-for-bit.
    *
    * Why L2 and not the cosine assignment the IVF path uses: measured
    * on the sf0.01 fixture (m=4, K=16), cosine-assignment training
    * DEGRADES ADC recall@10 monotonically (0.38 sample → 0.30 at 6
    * iters) — direction-only assignment with mean updates shrinks
    * codewords toward the origin, exactly the wrong trade for a scorer
    * that reconstructs magnitudes. L2 training at the same shape holds
    * 0.38→0.40; the big recall lever on i.i.d. fixtures is the shape
    * (see [[pqTopKTrained]]'s measured sweep).
    *
    * Each iteration is ONE job over the corpus: the fused
    * [[pqAssignL2]] projection feeds the per-(sub, centroid, dim) mean
    * agg directly (round applied in-engine — `round(avg(v), 6)`, the
    * same composition the old plan evaluated), and the m·K·subDim
    * rounded means are collected and merged driver-side (model-sized —
    * the bound the old per-iteration localCheckpoint relied on); empty
    * clusters keep their previous entry. At 100 TB you train on a
    * bounded sample and encode the full corpus with the frozen
    * codebook. */
  def pqCodebookTrained(corpus: DataFrame, m: Int, subDim: Int,
                        codebookSize: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    val vecs = fanOut(corpus.select(col("vec_id"), col("embedding")))
    var model: Map[Int, Seq[(Long, Seq[Double])]] =
      codebookRows(pqCodebook(corpus, m, subDim, codebookSize))
    for (_ <- 0 until iters if model.nonEmpty) {
      val means = pqAssignL2(vecs, model, m, subDim)
        .select(col("sub"), col("centroid_id"),
          posexplode(col("sub_emb")).as(Seq("d", "v")))
        .groupBy(col("sub"), col("centroid_id"), col("d"))
        .agg(round(avg(col("v").cast("double")), 6).as("m"))
        .collect()
        .map(r => ((r.getInt(0), r.getLong(1)), (r.getInt(2), r.getDouble(3))))
        .groupBy(_._1)
        .map { case (k, rs) => k -> rs.map(_._2).sortBy(_._1).map(_._2).toSeq }
      model = model.map { case (s, entries) =>
        s -> entries.map { case (cid, old) =>
          (cid, means.getOrElse((s, cid), old))
        }
      }
    }
    import spark.implicits._
    model.toSeq.sortBy(_._1)
      .flatMap { case (s, entries) => entries.map { case (cid, ce) => (s, cid, ce) } }
      .toDF("sub", "centroid_id", "c_emb")
  }

  /** PQ ANN top-k by asymmetric distance computation (ADC): queries
    * score the COMPRESSED corpus — dot(q,v) ≈ Σ_s lut(q, s, code(v,s))
    * with one (q_sub · codeword) lookup table per query, and the
    * similarity normalizes by the reconstructed corpus norm
    * √(Σ_s ‖codeword‖²). The corpus-side cost is one broadcast-LUT
    * join over the code table (m small ints per vector — the whole
    * point at 100 TB: the full-precision corpus is never rescanned at
    * query time). Deterministic given the sample codebook, so the
    * approximate structure oracle-checks exactly. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 4,
             subDim: Int = 16, codebookSize: Int = 16): DataFrame = {
    val cb = pqCodebook(corpus, m, subDim, codebookSize)
    val codes = pqEncode(fanOut(corpus.select(col("vec_id"), col("embedding"))), cb, m, subDim)
    pqAdc(codes, cb, queries, k, m, subDim)
  }

  /** [[pqTopK]] with K-MEANS-TRAINED codebooks and L2 encoding, at a
    * shape suited to the data: defaults m=16 (4-dim subspaces), K=64,
    * 2 Lloyd's iterations. Measured recall@10 sweep vs exact cosine on
    * the sf0.01 fixture (i.i.d. random vectors — PQ's worst case; 10
    * queries, the prototype sweep this config was picked from):
    *
    *   m=4  K=16: sample 0.38 / trained 0.40   (ann06's shape)
    *   m=8  K=64: sample 0.43 / trained 0.49
    *   m=16 K=32: sample 0.54 / trained 0.58
    *   m=16 K=64: sample 0.64 / trained 0.69   (this default)
    *
    * ann07 records the engine-measured number for this config
    * (pq_trained ≥ the IVF paths). 16 subspaces × 6-bit codes = 96
    * bits/vector — still a 21× compression of the 64-dim float32
    * corpus, and the ADC scan cost is unchanged (m small codes per
    * vector; broadcast LUTs). */
  def pqTopKTrained(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 16,
                    subDim: Int = 4, codebookSize: Int = 64,
                    iters: Int = 2,
                    cbOpt: Option[DataFrame] = None): DataFrame = {
    val cb = cbOpt.getOrElse(pqCodebookTrained(corpus, m, subDim, codebookSize, iters))
    val codes = pqAssignL2(fanOut(corpus.select(col("vec_id"), col("embedding"))),
        codebookRows(cb), m, subDim)
      .select(col("vec_id"), col("sub"), col("centroid_id"))
    pqAdc(codes, cb, queries, k, m, subDim)
  }

  /** IVF-PQ — the production ANN composition (the FAISS IVFPQ shape,
    * here without residual encoding so the whole chain stays
    * oracle-checkable): a coarse k-means quantizer restricts each
    * query's candidates to its `nprobe` nearest inverted lists, and
    * trained PQ codes — not full vectors — score those candidates via
    * broadcast lookup tables. Per-query cost: m·K LUT dots + the
    * probed lists' code rows (m small ints each); the full-precision
    * corpus is read only at index-build time. Recall compounds the
    * list-restriction loss (ann04/05's lever) with quantization loss
    * (ann06's lever) — both knobs measured in ann07's ladder;
    * SimilaritySpec pins `nprobe = numCentroids` ≡ the global trained
    * PQ ranking (no restriction ⇒ identical scores). */
  /** Scalar-quantization (SQ8) ANN — the third compression family
    * next to PQ (ann06/ann10) and JL random projection (ann08), and
    * the Faiss `SQ8` counterpart: per-dimension [lo, hi] trained on
    * the corpus (one explode + a dim-sized agg), each component
    * encoded to an 8-bit level `floor((v−lo)/(hi−lo)·256)` clamped to
    * 255 — 4× compression of float32 with per-DIMENSION (not
    * per-subspace) granularity, so distortion is far below PQ's at
    * the same scan cost — and queries score the DEQUANTIZED corpus
    * asymmetrically (full-precision query against level midpoints
    * `lo + (c+½)(hi−lo)/256`). Constant dimensions encode to level 0.
    *
    * Determinism: lo/hi are exact min/max; encode and dequantize are
    * single correctly-rounded IEEE expressions written with the SAME
    * association order as the oracle SQL, so codes and midpoints are
    * bit-identical cross-engine; only the final cosine carries the
    * usual Σ-order skew, absorbed by the family-wide 6-decimal round.
    *
    * At 100 TB the stored form writes the byte codes plus the 2·dim
    * range table: the ADC scan reads ¼ the bytes of the raw corpus
    * and the range table broadcasts everywhere. The encode pipeline
    * here is one corpus explode + dim-key broadcast join + one vec_id
    * reassembly shuffle — index-build cost, O(corpus), no all-pairs
    * anywhere. Output: (query_id, vec_id, sq_sim, rk). */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val cf = fanOut(corpus)
    // Per-dimension ranges: exact min/max (order-independent), one
    // map-side-combinable agg, collected driver-side (dim-sized — the
    // broadcast bound).
    val rng = cf.select(col("vec_id"),
        posexplode(toDouble(col("embedding"))).as(Seq("d", "v")))
      .groupBy(col("d"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect().map(r => (r.getInt(0), (r.getDouble(1), r.getDouble(2))))
      .sortBy(_._1)
    require(rng.map(_._1).toSeq == rng.indices.toSeq,
      "sq8: non-contiguous dimension ids")
    // Encode + dequantize FUSED per row against the literal range
    // table (identical element expression, lo/hi as literals — the
    // quantized level and midpoint are single correctly-rounded IEEE
    // expressions either way): the old explode → broadcast range join
    // → vec_id reassembly exchange (corpus-sized collect_list) is a
    // pure projection now (guide §2.4).
    val lohi = typedlit(rng.map(_._2).toSeq)
    val ra = cf.select(col("vec_id"),
      zip_with(toDouble(col("embedding")), lohi, (v, lh) => {
        val lo = lh.getField("_1"); val hi = lh.getField("_2")
        lo + (when(hi === lo, lit(0L))
          .otherwise(least(lit(255L),
            floor((v - lo) / (hi - lo) * lit(256))))
          .cast("double") + lit(0.5)) * (hi - lo) / lit(256)
      }).as("r_emb"))
    val q = queries.select(col("vec_id").as("query_id"),
      toDouble(col("embedding")).as("q_emb"))
    val scored = ra.crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("q_emb"), col("r_emb")) /
          (norm(col("q_emb")) * norm(col("r_emb"))), 6).as("sq_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sq_sim").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("sq_sim"),
        col("rk").cast("long").as("rk"))
  }

  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                numCentroids: Int = 16, kmIters: Int = 2, m: Int = 16,
                subDim: Int = 4, codebookSize: Int = 64, pqIters: Int = 2,
                nprobe: Int = 1,
                centsOpt: Option[DataFrame] = None,
                cbOpt: Option[DataFrame] = None): DataFrame = {
    val cents = centsOpt.getOrElse(kmeansCentroids(corpus, numCentroids, kmIters))
    val lists = ivfAssign(fanOut(corpus.select(col("vec_id"), col("embedding"))), cents)
      .select(col("vec_id"), col("centroid_id"))
    val probes = ivfAssignN(
        queries.select(col("vec_id"), col("embedding")), cents, nprobe)
      .select(col("vec_id").as("query_id"), col("centroid_id"))
    // a corpus vector lives in exactly one list, so multi-probe never
    // duplicates a candidate pair
    val pairs = probes.join(lists, Seq("centroid_id"))
      .select(col("query_id"), col("vec_id"))
    val cb = cbOpt.getOrElse(pqCodebookTrained(corpus, m, subDim, codebookSize, pqIters))
    val codes = pqAssignL2(fanOut(corpus.select(col("vec_id"), col("embedding"))),
        codebookRows(cb), m, subDim)
      .select(col("vec_id"), col("sub"), col("centroid_id"))
    pqAdc(codes, cb, queries, k, m, subDim, pairs = Some(pairs))
  }

  /** Materialize the DEPLOYABLE IVF-PQ index: PQ code rows partitioned
    * by coarse list (`path/lists/list_id=N/…`), trained centroids and
    * codebook alongside (`_centroids`, `_codebook`) so queries never
    * retrain — and never touch the full-precision corpus at all. The
    * stored bytes are m small ints per vector: at 100 TB of vectors
    * the index is ~m/(4·dim) of the corpus (~6% at m=16, dim=64
    * float). */
  def writeIvfPqCorpus(corpus: DataFrame, path: String,
                       numCentroids: Int = 16, kmIters: Int = 2,
                       m: Int = 16, subDim: Int = 4,
                       codebookSize: Int = 64, pqIters: Int = 2): Unit = {
    val cents = kmeansCentroids(corpus, numCentroids, kmIters)
    val cb = pqCodebookTrained(corpus, m, subDim, codebookSize, pqIters)
    cents.write.mode("overwrite").parquet(s"$path/_centroids")
    cb.write.mode("overwrite").parquet(s"$path/_codebook")
    // codes AND coarse list in ONE fused projection over one corpus
    // scan: both are per-row functions of the literal models, so the
    // old two-branch build (codes ⋈ lists on vec_id — a corpus-sized
    // join) collapses into the clustered-write shuffle alone.
    val centModel = modelRows(cents, "centroid_id", "c_emb")
    pqAssignL2(fanOut(corpus.select(col("vec_id"), col("embedding")))
        .withColumn("__list", nearestCentroid(centModel, col("embedding"))),
        codebookRows(cb), m, subDim)
      .select(col("vec_id"), col("sub"), col("centroid_id").as("code"),
        col("__list").as("list_id"))
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$path/lists")
  }

  /** Incremental maintenance of the stored IVF-PQ index: a new batch
    * is coarse-assigned with the index's FROZEN centroids and encoded
    * with its FROZEN codebook (retraining either model = rebuild +
    * manifest flip, never an append — drift would strand old codes),
    * then parquet-appended only into the touched lists' directories:
    * O(batch) at any corpus size, same contract as
    * [[appendToStoredBuckets]] / [[appendToIvfCorpus]]. */
  def appendToIvfPqCorpus(spark: org.apache.spark.sql.SparkSession,
                          newVectors: DataFrame, path: String,
                          m: Int = 16, subDim: Int = 4): Unit = {
    val cents = spark.read.parquet(s"$path/_centroids")
    val cb = spark.read.parquet(s"$path/_codebook")
    val centModel = modelRows(cents, "centroid_id", "c_emb")
    pqAssignL2(newVectors.select(col("vec_id"), col("embedding"))
        .withColumn("__list", nearestCentroid(centModel, col("embedding"))),
        codebookRows(cb), m, subDim)
      .select(col("vec_id"), col("sub"), col("centroid_id").as("code"),
        col("__list").as("list_id"))
      .repartition(col("list_id"))
      .write.mode("append").partitionBy("list_id").parquet(s"$path/lists")
  }

  /** Query the stored IVF-PQ index: the probe join DPP-prunes the code
    * scan to the probed lists' directories (the ann04b treatment), and
    * ADC scores the pruned code rows via broadcast LUTs from the stored
    * codebook. Result-identical to the in-flight [[ivfPqTopK]] with the
    * same parameters (spec-pinned) — the layout changes cost, never
    * results. */
  def ivfPqTopKStored(spark: org.apache.spark.sql.SparkSession, path: String,
                      queries: DataFrame, k: Int, nprobe: Int = 1,
                      m: Int = 16, subDim: Int = 4): DataFrame = {
    val cents = spark.read.parquet(s"$path/_centroids")
    val cb = spark.read.parquet(s"$path/_codebook")
    val codesAll = spark.read.parquet(s"$path/lists")
    val listType = codesAll.schema("list_id").dataType
    val qs = queries.select(col("vec_id").as("query_id"), col("embedding"))
    val probes = ivfAssignN(
        queries.select(col("vec_id"), col("embedding")), cents, nprobe)
      .select(col("vec_id").as("query_id"),
        col("centroid_id").cast(listType).as("list_id"))
    val cbn = cb.select(col("sub"), col("centroid_id").as("code"),
      dot(col("c_emb"), col("c_emb")).as("__n2"))
    // ONE DPP-pruned scan fans candidate code rows out to their queries
    val cand = codesAll.join(broadcast(probes), Seq("list_id"))
    // reconstructed norms per candidate vector (query-independent —
    // dedup the multi-query fan-out first; candidate-sized shuffle)
    val rec = cand.select(col("vec_id"), col("sub"), col("code")).distinct()
      .join(broadcast(cbn), Seq("sub", "code"))
      .groupBy(col("vec_id")).agg(sum(col("__n2")).as("__rn2"))
    val lut = subspaces(qs, "query_id", m, subDim)
      .join(broadcast(cb), Seq("sub"))
      .select(col("query_id"), col("sub"), col("centroid_id").as("code"),
        dot(col("sub_emb"), col("c_emb")).as("__dp"))
    val qn = qs.select(col("query_id"), norm(col("embedding")).as("__qn"))
    val sc = cand.join(broadcast(lut), Seq("query_id", "sub", "code"))
      .groupBy(col("vec_id"), col("query_id")).agg(sum(col("__dp")).as("__adp"))
    val scored = sc.join(broadcast(qn), Seq("query_id")).join(rec, Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        round(col("__adp") / (col("__qn") * sqrt(col("__rn2"))), 6).as("pq_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("pq_sim").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("pq_sim"),
        col("rk").cast("long").as("rk"))
  }

  /** IVF-PQ with exact re-ranking (the FAISS IndexRefineFlat shape):
    * the compressed index proposes `refineFactor·k` ADC-ranked
    * candidates per query, then ONLY those candidates' full-precision
    * vectors are fetched and re-scored exactly. Recall recovers most of
    * the quantization loss (the candidate list just has to CONTAIN the
    * true top-k, not rank it) while the corpus-sized work stays on the
    * code table: at 100 TB the exact leg reads refineFactor·k·|queries|
    * vectors via a candidate-sized equi-join — point lookups against
    * the vector store, never a scan. Measured in ann07's ladder. */
  def ivfPqRefineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                      refineFactor: Int = 4,
                      numCentroids: Int = 16, kmIters: Int = 2, m: Int = 16,
                      subDim: Int = 4, codebookSize: Int = 64, pqIters: Int = 2,
                      nprobe: Int = 1,
                      centsOpt: Option[DataFrame] = None,
                      cbOpt: Option[DataFrame] = None): DataFrame = {
    val cand = ivfPqTopK(corpus, queries, k * refineFactor, numCentroids,
        kmIters, m, subDim, codebookSize, pqIters, nprobe, centsOpt, cbOpt)
      .select(col("query_id"), col("vec_id"))
    val qs = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("__qemb"))
    val exact = corpus.select(col("vec_id"), col("embedding"))
      .join(cand, Seq("vec_id"))
      .join(broadcast(qs), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("embedding"), col("__qemb")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    exact.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"),
        col("rk").cast("long").as("rk"))
  }

  /** Shared ADC scoring: given the code table and its codebook, score
    * every (query, vector) pair as adp / (‖q‖ · √Σ‖codeword‖²) with
    * per-query broadcast LUTs, and rank top-k. The full-precision
    * corpus is never rescanned — the corpus-side input is `codes` (m
    * small ints per vector). */
  private def pqAdc(codes: DataFrame, cb: DataFrame, queries: DataFrame,
                    k: Int, m: Int, subDim: Int,
                    pairs: Option[DataFrame] = None): DataFrame = {
    val cbn = cb.select(col("sub"), col("centroid_id"),
      dot(col("c_emb"), col("c_emb")).as("__n2"))
    val rec = codes.join(broadcast(cbn), Seq("sub", "centroid_id"))
      .groupBy(col("vec_id")).agg(sum(col("__n2")).as("__rn2"))
    val qs = queries.select(col("vec_id").as("query_id"), col("embedding"))
    val lut = subspaces(qs, "query_id", m, subDim)
      .join(broadcast(cb), Seq("sub"))
      .select(col("query_id"), col("sub"), col("centroid_id"),
        dot(col("sub_emb"), col("c_emb")).as("__dp"))
    val qn = qs.select(col("query_id"), norm(col("embedding")).as("__qn"))
    // `pairs` (query_id, vec_id) restricts ADC to a candidate set
    // (IVF-PQ): the restriction joins BEFORE the LUT fan-out, so only
    // candidate code rows ever multiply by |queries|.
    val fanned = pairs match {
      case Some(p) => codes.join(p, Seq("vec_id"))
        .join(broadcast(lut), Seq("query_id", "sub", "centroid_id"))
      case None => codes.join(broadcast(lut), Seq("sub", "centroid_id"))
    }
    val sc = fanned
      .groupBy(col("vec_id"), col("query_id")).agg(sum(col("__dp")).as("__adp"))
    val scored = sc.join(broadcast(qn), Seq("query_id")).join(rec, Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        round(col("__adp") / (col("__qn") * sqrt(col("__rn2"))), 6).as("pq_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("pq_sim").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("pq_sim"), col("rk").cast("long").as("rk"))
  }

  /** Graph-based ANN (the fourth family next to hash/LSH, tree/IVF,
    * and quantization/PQ — the flat-graph form of the HNSW/NSW search):
    * greedy BEAM SEARCH over a prebuilt kNN graph. Per round the beam
    * expands to its graph neighbors, every candidate is scored exactly
    * against the query, and the best `beamWidth` survive; after
    * `rounds` synchronous rounds the answer is the top-k of EVERYTHING
    * scored along the way (the visited set — standard best-first
    * accounting, monotone in rounds). Multi-seed entry (`seeds`, e.g.
    * one min-id vector per LSH bucket) covers a bucket-blocked graph's
    * disconnected components, the flat-graph stand-in for HNSW's upper
    * layers. Deterministic end to end: fixed rounds, exact rounded
    * scores, (cos desc, vec_id asc) tie-break — hence the unrolled
    * oracle mirrors it round for round (the gr01–gr08 contract).
    *
    * Scale shape: the per-round state is (queries × beamWidth) rows —
    * broadcast-sized by construction — so each round is ONE
    * broadcast-hash join against the column-pruned corpus scan (vec_id,
    * embedding) plus one tiny edge join; nothing ever shuffles the
    * corpus. Rounds are staged ([[NearDup.stage]]) so the plan stays
    * linear in rounds, the PageRank-loop doctrine. On a STORED corpus
    * the candidate lookup becomes a DPP-pruned point read (ann03b's
    * layout); search cost is O(rounds · beam · degree) score
    * evaluations per query — independent of corpus size, the property
    * that makes graph ANN the in-memory industry default. */
  def beamSearchTopK(edges: DataFrame, corpus: DataFrame, queries: DataFrame,
                     seeds: DataFrame, k: Int, beamWidth: Int,
                     rounds: Int): DataFrame = {
    require(k >= 1 && beamWidth >= 1 && rounds >= 0,
      s"bad beam params k=$k beamWidth=$beamWidth rounds=$rounds")
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val corp = corpus.select(col("vec_id"), col("embedding"))
    val e = NearDup.stage(edges.select(col("vec_id"), col("nbr_id")))
    // score(cands): exact cosine of each (query, candidate) pair — the
    // candidate side is tiny, so it broadcasts into one corpus probe
    def score(cands: DataFrame): DataFrame =
      broadcast(cands).join(corp, Seq("vec_id"))
        .join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col("vec_id"),
          round(cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    def top(scored: DataFrame, n: Int): DataFrame =
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= n)
    val s0 = NearDup.stage(score(
      q.select(col("query_id")).crossJoin(broadcast(seeds.select(col("vec_id"))))))
    var beam = top(s0, beamWidth).select("query_id", "vec_id")
    var visited = s0
    for (_ <- 1 to rounds) {
      val expand = beam.join(e, Seq("vec_id"))
        .select(col("query_id"), col("nbr_id").as("vec_id"))
      val scored = NearDup.stage(score(
        beam.union(expand).distinct()))
      visited = visited.union(scored).distinct()
      beam = top(scored, beamWidth).select("query_id", "vec_id")
    }
    top(visited, k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"),
        col("rk").cast("long").as("rk"))
  }

  /** STORED kNN-graph index (round-17 verdict item 7 — the ann03b
    * treatment for graph-ANN): the [[knnGraph]] adjacency is written
    * ONCE, partitioned by the source node's LSH bucket, with the
    * [[bucketSeeds]] entry points as an underscore sidecar. Beam
    * search then expands each round's frontier by reading ONLY the
    * frontier nodes' bucket directories (broadcast join on the
    * partition column → dynamic partition pruning, PlanSpec-gated) —
    * at 100 TB the graph build's Σ bucket² self-join is paid at index
    * time, and each query round touches O(frontier) partitions, never
    * the full adjacency. */
  def writeGraphIndex(corpus: DataFrame, path: String, k: Int,
                      numPlanes: Int = 8, dim: Int = 64,
                      maxBucketSize: Option[Int] = None): Unit = {
    val edges = knnGraph(corpus, k, numPlanes, dim, maxBucketSize)
    edges.join(corpus.select(col("vec_id"),
        lshBucket(col("embedding"), numPlanes, dim).as("bucket")), Seq("vec_id"))
      // bucket-count partitions, not AQE-coalesced — see
      // [[writeBucketedCorpus]]'s write comment.
      .repartition(1 << numPlanes, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    bucketSeeds(corpus, numPlanes, dim, maxBucketSize)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_seeds")
  }

  /** [[beamSearchTopK]] against a [[writeGraphIndex]] layout: same
    * rounds, same pinned tiebreaks, same results (ann14b shares
    * ann14's oracle; SimilaritySpec pins stored ≡ in-flight), but each
    * round's neighbor expansion joins the broadcast frontier against
    * the STORED adjacency on (bucket, vec_id) — the partition-column
    * key DPP-prunes the scan to the frontier's buckets. Scoring stays
    * the exact-cosine corpus probe of the in-flight form. */
  def beamSearchTopKStored(spark: org.apache.spark.sql.SparkSession,
                           path: String, corpus: DataFrame,
                           queries: DataFrame, k: Int, beamWidth: Int,
                           rounds: Int, numPlanes: Int = 8,
                           dim: Int = 64): DataFrame = {
    require(k >= 1 && beamWidth >= 1 && rounds >= 0,
      s"bad beam params k=$k beamWidth=$beamWidth rounds=$rounds")
    val stored = spark.read.parquet(path)
    val bucketType = stored.schema("bucket").dataType
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val corp = corpus.select(col("vec_id"), col("embedding"))
    def score(cands: DataFrame): DataFrame =
      broadcast(cands).join(corp, Seq("vec_id"))
        .join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col("vec_id"),
          round(cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    def top(scored: DataFrame, n: Int): DataFrame =
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= n)
    val seeds = spark.read.parquet(s"$path/_seeds")
    val s0 = NearDup.stage(score(
      q.select(col("query_id")).crossJoin(broadcast(seeds.select(col("vec_id"))))))
    var beam = top(s0, beamWidth).select("query_id", "vec_id")
    var visited = s0
    for (_ <- 1 to rounds) {
      // frontier buckets from the corpus embeddings (tiny broadcast
      // side, partition-typed key so the DPP subquery needs no cast)
      val frontier = broadcast(beam).join(corp, Seq("vec_id"))
        .select(col("query_id"), col("vec_id"),
          lshBucket(col("embedding"), numPlanes, dim).cast(bucketType)
            .as("bucket"))
      val expand = graphFrontierExpansion(spark, path, frontier)
      val scored = NearDup.stage(score(beam.union(expand).distinct()))
      visited = visited.union(scored).distinct()
      beam = top(scored, beamWidth).select("query_id", "vec_id")
    }
    top(visited, k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"),
        col("rk").cast("long").as("rk"))
  }

  /** One beam round's neighbor expansion against the stored adjacency:
    * broadcast frontier (query_id, vec_id, bucket — bucket already in
    * the partition-column type) joined on (bucket, vec_id), so the
    * bucket equi-pair DPP-prunes the scan to the frontier's bucket
    * directories. Factored out of [[beamSearchTopKStored]]'s round
    * loop because the loop's per-round staging (eager checkpoint)
    * hides the adjacency scans from the FINAL plan — the PlanSpec DPP
    * gate inspects this building block directly. */
  def graphFrontierExpansion(spark: org.apache.spark.sql.SparkSession,
                             path: String, frontier: DataFrame): DataFrame =
    spark.read.parquet(path).join(broadcast(frontier), Seq("bucket", "vec_id"))
      .select(col("query_id"), col("nbr_id").as("vec_id"))

  /** Entry points for [[beamSearchTopK]] over a bucket-blocked graph:
    * the min-id vector of every (capped) LSH bucket — one deterministic
    * seed per graph component, ≤ 2^numPlanes rows. */
  def bucketSeeds(corpus: DataFrame, numPlanes: Int = 8, dim: Int = 64,
                  maxBucketSize: Option[Int] = None): DataFrame = {
    val b = corpus.select(col("vec_id"),
      lshBucket(col("embedding"), numPlanes, dim).as("__bk"))
    val kept = maxBucketSize match {
      case Some(cap) =>
        b.groupBy(col("__bk")).agg(min(col("vec_id")).as("vec_id"),
            count(lit(1)).as("__bc"))
          .filter(col("__bc") <= cap)
      case None =>
        b.groupBy(col("__bk")).agg(min(col("vec_id")).as("vec_id"))
    }
    kept.select(col("vec_id"))
  }

  /** Batch kNN-graph: every corpus vector's top-k neighbors, LSH-
    * bucket-blocked (the input to graph-based dedup, kNN-LM data
    * curation, and cluster seeding). A within-bucket self-join — the
    * dd06b cost profile, Σ bucket² pairs with the plane count as the
    * lever, never corpus² — then one per-vector rank (WindowGroupLimit
    * pushes the k-filter below the sort; the key is the
    * high-cardinality vec_id, parallel at any scale). Vectors alone in
    * their bucket have no in-bucket neighbors and are absent from the
    * output, exactly like dd06b's pair semantics — probe more planes
    * down or multi-probe for coverage.
    *
    * `maxBucketSize` is the hot-bucket guard (the minhashCandidates /
    * hashedTfNearDup contract): a bucket over the cap is dropped
    * ENTIRELY before the self-join — its members lose their in-bucket
    * neighbors (bounded, deterministic recall loss) instead of the
    * bucket going Σ bucket²-quadratic when one LSH bucket concentrates
    * (the exact shape that made dd17 measure 122× at 10× data before
    * its cap). Off by default; set it ~a few × corpus/2^numPlanes. */
  def knnGraph(corpus: DataFrame, k: Int,
               numPlanes: Int = 8, dim: Int = 64,
               maxBucketSize: Option[Int] = None): DataFrame = {
    val b0 = fanOut(corpus).select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), numPlanes, dim).as("__bk"))
    val b = maxBucketSize match {
      case Some(cap) =>
        val keep = b0.groupBy(col("__bk")).agg(count(lit(1)).as("__bc"))
          .filter(col("__bc") <= cap).select(col("__bk"))
        b0.join(keep, Seq("__bk"))
      case None => b0
    }
    val a = b.select(col("__bk"), col("vec_id"), col("embedding"))
    val bb = b.select(col("__bk"), col("vec_id").as("nbr_id"),
      col("embedding").as("__nemb"))
    val scored = a.join(bb, Seq("__bk"))
      .filter(col("vec_id") =!= col("nbr_id"))
      .select(col("vec_id"), col("nbr_id"),
        round(cosine(col("embedding"), col("__nemb")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_sim").desc, col("nbr_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("vec_id"), col("nbr_id"), col("cos_sim"),
        col("rk").cast("long").as("rk"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus with k-means, then WITHIN
    * each cluster drop every vector that has a lower-id neighbor above
    * the cosine threshold — pairwise comparison never crosses a cluster
    * boundary, so the quadratic step is bounded by the largest cluster,
    * not the corpus. Deterministic end-to-end ([[kmeansCentroids]] is
    * fixed-init fixed-iters, similarities rounded to 6 decimals,
    * min-id keep rule), hence oracle-checkable.
    *
    * At 100 TB: centroids are dim·k doubles (broadcast), assignment is
    * one corpus pass, and the within-cluster self-join is a hash
    * equi-join on centroid_id — the same Σ cluster² cost profile as the
    * LSH-bucketed near-dup, with the cluster count as the lever.
    * Returns (vec_id, centroid_id) of the KEPT vectors. */
  def semDedup(corpus: DataFrame, threshold: Double,
               numCentroids: Int = 16, kmeansIters: Int = 2): DataFrame = {
    val cents = kmeansCentroids(corpus, numCentroids, kmeansIters)
    val assigned = ivfAssign(fanOut(corpus.select(col("vec_id"), col("embedding"))), cents)
    val a = assigned.select(col("centroid_id"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = assigned.select(col("centroid_id"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    val dropped = a.join(b, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(cosine(col("emb_a"), col("emb_b")), 6) > threshold)
      .select(col("id_b").as("vec_id")).distinct()
    assigned.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("centroid_id"))
  }

  /** Embedding near-duplicate pairs within an explicit id block —
    * an O(block²) theta-join kept ONLY as the exact-within-block
    * baseline for small blocks; [[embeddingNearDupBucketed]] is the
    * corpus-scale form. */
  def embeddingNearDup(corpus: DataFrame, threshold: Double, maxId: Long): DataFrame = {
    val sub = corpus.filter(col("vec_id") < maxId)
    val a = sub.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = sub.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") > threshold)
  }

  /** Embedding near-duplicate pairs over the FULL corpus, blocked by
    * hyperplane LSH bucket: each vector gets one [[lshBucket]] id (a
    * pure projection, no shuffle), pairs are scored only within a
    * bucket — a hash EQUI-join on the bucket id instead of an all-pairs
    * nested-loop theta-join. Expected cost drops from O(n²) to
    * O(Σ bucket²) ≈ O(n²/2^planes); at corpus scale the bucket id is
    * also the natural storage partition key. Recall < 1 by
    * construction (a near-dup pair split by a hyperplane is missed —
    * high-cosine pairs agree on most hyperplanes, so few are); fully
    * deterministic given the md5-derived planes, hence oracle-checkable.
    * Each pair shares exactly one bucket value, so no dedup is needed. */
  def embeddingNearDupBucketed(corpus: DataFrame, threshold: Double,
                               numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val cb = corpus.select(col("vec_id"), col("embedding"))
      .withColumn("bucket", lshBucket(col("embedding"), numPlanes, dim))
    val a = cb.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = cb.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") > threshold)
  }

  /** Cross-set semantic contamination (the embedding analog of n-gram
    * decontamination, tx13): every (train, eval) pair sharing an LSH
    * bucket whose cosine clears the threshold. The eval benchmark is
    * broadcast — tiny next to any training corpus — so the whole check
    * is ONE map-side pass over the training embeddings: bucket
    * projection, broadcast-hash bucket join, cosine filter; zero
    * shuffles of training data. Recall < 1 by bucket construction
    * (compose with [[lshProbeBuckets]] fan-out of the EVAL side when
    * higher recall is worth nprobe× the broadcast rows). */
  def semanticContamination(train: DataFrame, evalSet: DataFrame,
                            threshold: Double, numPlanes: Int = 8,
                            dim: Int = 64): DataFrame = {
    val t = train.select(col("vec_id").as("train_id"), col("embedding").as("t_emb"))
      .withColumn("bucket", lshBucket(col("t_emb"), numPlanes, dim))
    val e = evalSet.select(col("vec_id").as("eval_id"), col("embedding").as("e_emb"))
      .withColumn("bucket", lshBucket(col("e_emb"), numPlanes, dim))
    t.join(broadcast(e), Seq("bucket"))
      .select(col("train_id"), col("eval_id"),
        round(cosine(col("t_emb"), col("e_emb")), 6).as("cos_sim"))
      .filter(col("cos_sim") > threshold)
  }

  /** Deterministic random-projection matrix component (j, d): the
    * [[planeWeight]] md5 derivation under an `rp_` namespace, so the
    * projection directions are independent of the LSH hyperplanes. */
  def rpWeight(j: Int, d: Int): Double = {
    val mdigest = java.security.MessageDigest.getInstance("MD5")
    val hex = mdigest.digest(s"rp_${j}_$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    ((java.lang.Long.parseLong(hex, 16) % 2001) - 1000).toDouble / 1000.0
  }

  /** Johnson–Lindenstrauss projection onto `outDim` md5-derived random
    * directions: `outDim` literal-plane [[dot]]s — a pure codegen
    * projection, no shuffle. Components are rounded to 6 decimals so
    * both engines rank the SAME reduced vectors. */
  def randomProject(emb: Column, outDim: Int, dim: Int): Column =
    array((0 until outDim).map { j =>
      round(dot(emb, typedLit((0 until dim).map(d => rpWeight(j, d)))), 6)
    }: _*)

  /** ANN via JL dimensionality reduction: candidates are the top
    * `cand` per query by cosine in the `outDim`-dimensional projected
    * space (outDim/dim of brute force's arithmetic and — at corpus
    * scale, with projections precomputed alongside the vectors — of
    * its scan bytes), then ONLY the candidates are re-ranked at full
    * precision. Complementary to bucketing: LSH prunes candidates by
    * hash equality (recall cliffs when a neighbor lands one bucket
    * over), JL keeps every vector scoreable but at reduced resolution,
    * so recall degrades smoothly with outDim. Measured on the i.i.d.
    * fixture (ann07, recall@10, 50 queries): 0.428 at outDim=16/
    * cand=40 — above every LSH-bucket path (0.118–0.162) at ¼ the
    * scoring arithmetic of brute force; real corpora, whose neighbors
    * are far above the noise floor, project much more faithfully. */
  def randomProjectionTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                           outDim: Int = 16, dim: Int = 64,
                           cand: Int = 40): DataFrame = {
    val cp = corpus.select(col("vec_id"), col("embedding"),
      randomProject(col("embedding"), outDim, dim).as("p_emb"))
    val qp = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      randomProject(col("embedding"), outDim, dim).as("qp_emb"))
    val scored = cp.crossJoin(broadcast(qp))
      .select(col("query_id"), col("vec_id"), col("embedding"), col("q_emb"),
        round(cosine(col("qp_emb"), col("p_emb")), 6).as("p_sim"))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("p_sim").desc, col("vec_id").asc)
    val candidates = scored.withColumn("crk", row_number().over(wc))
      .filter(col("crk") <= cand)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    candidates
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"),
        col("rk").cast("long").as("rk"))
  }
}
