package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25PerQuery with one query equals the single-query bm25 scorer") {
    // The multi-query form must be a strict generalization: same corpus
    // stats, same df, same float association — identical scores.
    val docs = graft.Tables.documents(spark, sf0001)
    val terms = Seq("join", "scan", "vector", "spark")
    val single = graft.functions.TextAnalysis.bm25(docs, "doc_id", "text", terms)
      .select($"doc_id", $"bm25")
    val multi = Retrieval.bm25PerQuery(docs, "doc_id", "text",
        terms.map(t => (0L, t)).toDF("query_id", "term"))
      .select($"doc_id", $"bm25")
    assert(multi.collect().toSet == single.collect().toSet,
      "bm25PerQuery(single query) diverged from TextAnalysis.bm25")
  }

  test("bm25PerQuery scores each query against its OWN terms only") {
    // Two disjoint single-term queries over a 3-doc corpus: each query
    // must rank only docs containing its term, never the other's.
    val docs = Seq(
      (1L, "alpha alpha beta"),
      (2L, "beta beta beta"),
      (3L, "alpha gamma")).toDF("doc_id", "text")
    val q = Seq((10L, "alpha"), (20L, "beta")).toDF("query_id", "term")
    val got = Retrieval.bm25PerQuery(docs, "doc_id", "text", q)
      .select($"query_id", $"doc_id").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L), (10L, 3L), (20L, 1L), (20L, 2L)),
      s"wrong (query, doc) hit set: $got")
  }

  test("hybridRrf: missing side contributes 0 and the fused score is exact") {
    // Toy corpus engineered so the lexical and vector legs disagree:
    // doc 1 matches the term but has an orthogonal embedding (misses
    // the query's LSH bucket is not guaranteed on toy dims, so check
    // the arithmetic through the returned ranks instead: for every row
    // rrf == coalesce(1/(60+r_lex),0) + coalesce(1/(60+r_vec),0)).
    val docs = graft.Tables.documents(spark, sf0001)
    val emb = graft.Tables.embeddings(spark, sf0001)
    val path = java.nio.file.Files.createTempDirectory("graft_rrf_spec").toString
    Similarity.writeBucketedCorpus(emb, path)
    val qTerms = Seq((0L, "join"), (0L, "scan")).toDF("query_id", "term")
    val qVecs = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("query_id"), $"embedding")
    val fused = Retrieval.hybridRrf(spark, docs, "doc_id", "text", path,
      qTerms, qVecs, 10).collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val rl = Option(r.getAs[java.lang.Long]("r_lex")).map(_.toDouble)
      val rv = Option(r.getAs[java.lang.Long]("r_vec")).map(_.toDouble)
      assert(rl.isDefined || rv.isDefined, "row from neither leg")
      val expect = math.rint((rl.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (60 + x)).getOrElse(0.0)) * 1e6) / 1e6
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-9,
        s"rrf mismatch on $r")
    }
    // both single-leg kinds must actually occur (the legs disagree
    // somewhere on the fixture, or the full-outer join is untested)
    assert(fused.exists(r => r.isNullAt(r.fieldIndex("r_vec"))),
      "no lexical-only rows — full-outer fusion untested on the vec side")
    assert(fused.exists(r => r.isNullAt(r.fieldIndex("r_lex"))),
      "no vector-only rows — full-outer fusion untested on the lex side")
  }

  test("appendToIvfCorpus: O(batch) IVF maintenance with frozen centroids") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_append").toString
    Similarity.writeIvfCorpus(emb.filter($"vec_id" < 300), path, 16, 2)
    def listFiles: Map[String, Set[(String, Long)]] =
      new java.io.File(s"$path/lists").listFiles()
        .filter(_.getName.startsWith("centroid_id="))
        .map(d => d.getName ->
          d.listFiles().map(f => (f.getName, f.length())).toSet).toMap
    val before = listFiles
    val batch = emb.filter($"vec_id" >= 300 && $"vec_id" < 400)
    Similarity.appendToIvfCorpus(spark, batch, path)
    val after = listFiles
    // which lists did the batch land in? (assigned with the FROZEN
    // stored centroids, the operator's contract)
    val cents = spark.read.parquet(s"$path/_centroids")
    val hit = Similarity.ivfAssign(batch.select($"vec_id", $"embedding"), cents)
      .select($"centroid_id").distinct().as[Long].collect()
      .map(c => s"centroid_id=$c").toSet
    before.keys.filterNot(hit).foreach { c =>
      assert(after(c) == before(c), s"untouched list $c was rewritten")
    }
    hit.foreach { c =>
      assert(before.getOrElse(c, Set.empty).subsetOf(after.getOrElse(c, Set.empty)),
        s"append lost files in $c")
    }
    // the incremental index answers exactly like a from-scratch layout
    // built with the SAME (frozen) centroids over the full corpus
    val manual = java.nio.file.Files.createTempDirectory("graft_ivf_manual").toString
    cents.write.mode("overwrite").parquet(s"$manual/_centroids")
    Similarity.ivfAssign(
        emb.filter($"vec_id" < 400).select($"vec_id", $"embedding"), cents)
      .repartition($"centroid_id")
      .write.mode("overwrite").partitionBy("centroid_id").parquet(s"$manual/lists")
    val q = emb.filter($"vec_id" < 10)
    assert(Similarity.ivfTopKStored(spark, path, q, 5).collect().toSet ==
      Similarity.ivfTopKStored(spark, manual, q, 5).collect().toSet,
      "incremental IVF index diverges from same-centroid rebuild")
  }

  test("hybridRrf nprobe: multi-probe vector leg tracks the brute-force fusion at least as well") {
    // The fused ranking with a multi-probed vector leg must agree with
    // the IDEAL fusion (brute-force vector leg) at least as much as the
    // single-probe fusion does — the recall knob composes through RRF.
    val docs = graft.Tables.documents(spark, sf0001)
    val emb = graft.Tables.embeddings(spark, sf0001)
    val path = java.nio.file.Files.createTempDirectory("graft_rrf_np").toString
    try {
      Similarity.writeBucketedCorpus(emb, path)
      val qTerms = Seq(0L -> "join", 0L -> "scan", 7L -> "vector", 7L -> "spark",
        23L -> "filter", 23L -> "join").toDF("query_id", "term")
      val qVecs = emb.filter($"vec_id".isin(0L, 7L, 23L))
        .select($"vec_id".as("query_id"), $"embedding")
      def top10(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"query_id")
          .orderBy($"rrf".desc, $"doc_id".asc)
        df.withColumn("fr", row_number().over(w)).filter($"fr" <= 10)
          .select($"query_id", $"doc_id").as[(Long, Long)].collect().toSet
      }
      // the IDEAL fusion: same lexical leg, brute-force vector leg
      import org.apache.spark.sql.expressions.Window
      val bm = Retrieval.bm25PerQuery(docs, "doc_id", "text", qTerms)
      val wl = Window.partitionBy($"query_id").orderBy($"bm25".desc, $"doc_id".asc)
      val lex = bm.withColumn("r_lex", row_number().over(wl)).filter($"r_lex" <= 10)
        .select($"query_id", $"doc_id", $"r_lex".cast("long").as("r_lex"))
      val vecIdeal = Similarity.bruteForceTopK(emb,
          qVecs.select($"query_id".as("vec_id"), $"embedding"), 10)
        .select($"query_id", $"vec_id".as("doc_id"), $"rk".as("r_vec"))
      val ideal = top10(lex.join(vecIdeal, Seq("query_id", "doc_id"), "full_outer")
        .select($"query_id", $"doc_id",
          round(coalesce(lit(1.0) / (lit(60) + $"r_lex"), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + $"r_vec"), lit(0.0)), 6).as("rrf")))
      val agree1 = top10(Retrieval.hybridRrf(spark, docs, "doc_id", "text", path,
        qTerms, qVecs, 10)).intersect(ideal).size
      val agree4 = top10(Retrieval.hybridRrf(spark, docs, "doc_id", "text", path,
        qTerms, qVecs, 10, nprobe = 4)).intersect(ideal).size
      info(s"fusion agreement with ideal: nprobe=1 $agree1/${ideal.size}, nprobe=4 $agree4/${ideal.size}")
      assert(agree4 >= agree1,
        s"multi-probe fusion agrees LESS with the ideal: $agree4 < $agree1")
    } finally graft.Scratch.delete(path)
  }

  test("maxSimRerank matches a brute-force MaxSim reference exactly (integer arithmetic)") {
    // In-Scala reference encoder: the SAME md5 derivation the operator
    // (and its DuckDB oracle) uses — first 8 hex chars as int, % 2001
    // - 1000, seeded by "j~term".
    def comp(term: String, j: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j~$term".getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 2001 - 1000
    }
    def vec(term: String): Seq[Long] = (0 until 8).map(j => comp(term, j))
    def dot(a: Seq[Long], b: Seq[Long]): Long = a.zip(b).map { case (x, y) => x * y }.sum

    val docs = Seq(
      (10L, "spark joins scan fast"),
      (11L, "window group stream batch"),
      (12L, "vector search index")).toDF("doc_id", "text")
    val qTerms = Seq(0L -> "spark", 0L -> "scan", 1L -> "stream", 1L -> "group")
      .toDF("query_id", "term")
    val cands = Seq((0L, 10L), (0L, 12L), (1L, 11L), (1L, 12L))
      .toDF("query_id", "doc_id")
    val got = Retrieval.maxSimRerank(docs, "doc_id", "text", qTerms, cands)
      .select($"query_id", $"doc_id", $"maxsim", $"rerank")
      .as[(Long, Long, Long, Long)].collect().toSet

    val docTerms = Map(
      10L -> Seq("spark", "joins", "scan", "fast"),
      11L -> Seq("window", "group", "stream", "batch"),
      12L -> Seq("vector", "search", "index"))
    val queryTerms = Map(0L -> Seq("spark", "scan"), 1L -> Seq("stream", "group"))
    val scores = Seq((0L, 10L), (0L, 12L), (1L, 11L), (1L, 12L)).map { case (q, d) =>
      (q, d, queryTerms(q).map(t =>
        docTerms(d).map(s => dot(vec(t), vec(s))).max).sum)
    }
    val expected = scores.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._2)).zipWithIndex
        .map { case ((q, d, ms), i) => (q, d, ms, i + 1L) }
    }.toSet
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("maxSimRerank scores ONLY candidate edges; rerank is dense per query") {
    val docs = graft.Tables.documents(spark, sf0001)
    val qTerms = Seq(0L -> "join", 0L -> "scan", 1L -> "vector")
      .toDF("query_id", "term")
    // Restrict query 0 to three docs, query 1 to two — the operator
    // must not leak scores for any other doc (the corpus is NOT
    // rescanned beyond the candidate semi-join).
    val cands = Seq((0L, 3L), (0L, 5L), (0L, 9L), (1L, 5L), (1L, 7L))
      .toDF("query_id", "doc_id")
    val out = Retrieval.maxSimRerank(docs, "doc_id", "text", qTerms, cands)
      .select($"query_id", $"doc_id", $"rerank")
      .as[(Long, Long, Long)].collect()
    assert(out.map(r => (r._1, r._2)).toSet ==
      Set((0L, 3L), (0L, 5L), (0L, 9L), (1L, 5L), (1L, 7L)))
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"rerank not dense for query $q")
    }
  }

  test("phraseSearch: adjacency, overlap, 3-term chains, and bucket-pruned scan") {
    val docs = Seq(
      (1L, "a b c a b"),   // "a b" at 0 and 3
      (2L, "b a b a b"),   // "a b" at 1 and 3; "b a b" at 0 and 2 (overlapping)
      (3L, "a a a"),       // "a a" at 0 and 1 (overlapping); no "a b"
      (4L, "c c c"),       // no phrase at all
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_posidx").toString
    try {
      Retrieval.writePositionalIndex(docs, "doc_id", "text", path)
      def run(phrase: String*) =
        Retrieval.phraseSearch(spark, path, phrase)
          .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(run("a", "b") == Map(1L -> ((2L, 0L)), 2L -> ((2L, 1L))))
      assert(run("a", "a") == Map(3L -> ((2L, 0L)))) // overlapping occurrences count
      assert(run("b", "a", "b") == Map(2L -> ((2L, 0L))))
      assert(run("a", "b", "c") == Map(1L -> ((1L, 0L))))
      assert(run("c", "a", "b") == Map(1L -> ((1L, 2L))))
      assert(run("z", "b").isEmpty) // absent term -> empty, no error
      // the scan must prune to ONLY the phrase terms' bucket partitions
      val plan = Retrieval.phraseSearch(spark, path, Seq("a", "b"))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val pfs = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
      assert(pfs.nonEmpty, s"index scan lost partition pruning:\n$plan")
      assert(pfs.forall(_.contains("bucket")),
        s"bucket literals must reach partition pruning: ${pfs.mkString("; ")}")
    } finally graft.Scratch.delete(path)
  }
}
