package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid (lexical + vector) retrieval over a query SET — the
  * production RAG serving shape: N queries arrive as a batch, the
  * lexical leg scores BM25 per query, the vector leg probes the STORED
  * bucket-partitioned ANN index (dynamic partition pruning restricts
  * the corpus scan to the buckets the batch hashes into — the ann03b
  * machinery), and the two rankings fuse by reciprocal-rank fusion.
  *
  * Derived operator — the reference's engine stops at relational
  * retrieval; this composes [[graft.functions.TextAnalysis.bm25]]'s
  * scoring formula (per-query form) with
  * [[Similarity.bucketedTopKStored]].
  *
  * Scale notes (100 TB corpus, q queries/batch):
  *  - lexical: the token explode is one corpus pass shared by ALL
  *    queries (terms of every query are matched in the same scan —
  *    the per-(doc,term) hit table is built once, then fanned out to
  *    queries by a broadcast term join);
  *  - vector: the stored index means the corpus embedding scan reads
  *    only the ≤ q probed buckets' files, never the full corpus;
  *  - fusion: a hash full-outer join on (query_id, doc_id) — both legs
  *    are already ≤ q·k rows.
  */
object Retrieval {

  /** BM25 per (query, doc): `queryTerms` is (query_id, term) — the
    * multi-query generalization of [[graft.functions.TextAnalysis.bm25]]
    * with the SAME scoring formula and float association (idf · tf-sat
    * product order is oracle-pinned; reorderings flip the 6th decimal).
    *
    * Corpus statistics (N, avgdl, per-term df) are query-independent:
    * computed once from one tokenize pass, then joined to the broadcast
    * query-term list. df counts docs containing the term among docs
    * matching ANY query's terms? No — df must be the corpus document
    * frequency, so it is computed over the full per-(doc, term) hit
    * table BEFORE the query join, exactly as the single-query form
    * does for its own term set. */
  def bm25PerQuery(docs: DataFrame, idCol: String, textCol: String,
                   queryTerms: DataFrame,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import graft.functions.TextAnalysis.tokens
    val terms = queryTerms.select(col("query_id"), col("term"))
    val distinctTerms = terms.select(col("term")).distinct()
    val lens = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), size(tokens(col(textCol))).cast("long").as("__len"))
    val stats = lens.agg(count(lit(1)).cast("long").as("__n"),
      avg(col("__len")).as("__avgl"))
    // One corpus tokenize pass; the broadcast semi-join keeps only terms
    // some query asks for (the 100 TB cost is this scan, shared by all
    // queries in the batch).
    val tf = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .join(broadcast(distinctTerms), Seq("term"), "left_semi")
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).cast("long").as("__tf"))
    val dfs = tf.groupBy(col("term")).agg(count(lit(1)).cast("long").as("__df"))
    val idf = log((col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)) + 1)
    val term = idf * ((col("__tf") * lit(k1 + 1)) /
      (col("__tf") + lit(k1) * (lit(1 - b) + lit(b) * col("__len") / col("__avgl"))))
    tf.join(broadcast(dfs), Seq("term"))
      .join(broadcast(terms), Seq("term"))
      .join(lens, Seq(idCol))
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col(idCol))
      .agg(round(sum(term), 6).as("bm25"))
  }

  /** Hybrid retrieval with reciprocal-rank fusion for a batch of N
    * queries: per query, lexical top-k by BM25 and vector top-k from
    * the stored bucketed ANN index at `indexPath` (built by
    * [[Similarity.writeBucketedCorpus]]), fused by
    * RRF(q, d) = Σ_sides 1/(rrfK + rank_side(q, d)) — rank-only, so the
    * two score scales need no calibration. A doc missing from one side
    * contributes 0 for that side (full-outer fusion join).
    *
    * `queryTerms` = (query_id, term); `queryVecs` = (query_id,
    * embedding). Returns (query_id, doc_id, r_lex, r_vec, rrf); the
    * fixture's doc_id/vec_id ranges align, so the vector leg's vec_id
    * IS the doc id.
    *
    * Both per-query rankings are `row_number ≤ k` filters —
    * WindowGroupLimit keeps each a bounded per-partition heap
    * (PlanSpec's global sweep gates this).
    *
    * Rank-fusion sensitivity to the approximate vector leg, measured
    * at sf0.01 over tx25's 3-query mix: the indexed fusion's top-10 by
    * RRF keeps 18/30 (0.60) of the brute-force-leg fusion's top-10.
    * That is with the LSH leg itself at 0.118 recall@10 (ann07's
    * number on i.i.d. random fixture vectors — the worst case for
    * hyperplane LSH); fusion cushions the loss because a doc the
    * bucket restriction drops merely loses its r_vec term while its
    * lexical rank still scores. Real clustered embeddings sit far
    * above this floor. `nprobe` composes the multi-probe recall knob
    * through the fusion: RetrievalSpec measures ideal-fusion agreement
    * 18/30 → 19/30 going nprobe 1 → 4 on the same fixture, with the
    * index untouched. */
  def hybridRrf(spark: SparkSession, docs: DataFrame, idCol: String,
                textCol: String, indexPath: String,
                queryTerms: DataFrame, queryVecs: DataFrame, k: Int,
                rrfK: Int = 60, numPlanes: Int = 8, dim: Int = 64,
                nprobe: Int = 1): DataFrame = {
    val bm = bm25PerQuery(docs, idCol, textCol, queryTerms)
    val wl = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25").desc, col(idCol).asc)
    val lex = bm.withColumn("r_lex", row_number().over(wl))
      .filter(col("r_lex") <= k)
      .select(col("query_id"), col(idCol).as("doc_id"),
        col("r_lex").cast("long").as("r_lex"))
    // nprobe > 1 = multi-probe recall knob on the vector leg: the scan
    // still DPP-prunes to the (now nprobe× larger) probe-bucket union;
    // the index layout is untouched.
    val vec = Similarity.bucketedTopKStored(spark, indexPath,
        queryVecs.select(col("query_id").as("vec_id"), col("embedding")),
        k, numPlanes, dim, nprobe)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rk").as("r_vec"))
    lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"), col("r_lex"), col("r_vec"),
        round(coalesce(lit(1.0) / (lit(rrfK) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("r_vec")), lit(0.0)), 6).as("rrf"))
  }

  /** Deterministic per-term embedding component j of `term` — the
    * md5-derived integer in [-1000, 1000] (the dd17 hyperplane
    * convention, seeded by (j, term)). Integer-valued so every MaxSim
    * dot product below is EXACT 64-bit arithmetic: no float summation
    * order to diverge between engines. */
  private[operators] def termVecComponent(term: Column, j: Int): Column =
    conv(substring(md5(concat(lit(s"${j}~"), term)), 1, 8), 16, 10)
      .cast("long") % 2001 - 1000

  /** Late-interaction (MaxSim) reranking — the ColBERT scoring shape
    * (Khattab & Zaharia, SIGIR'20): score(q, d) = Σ_{t ∈ q} max_{s ∈ d}
    * ⟨e_t, e_s⟩ over per-TERM embeddings, the second-stage reranker RAG
    * stacks on a cheap first-stage candidate list.
    *
    * This is the candidate-restricted form: `candidates` is
    * (query_id, doc_id) from the first stage (BM25 top-k here — q·k
    * rows, broadcast-sized), and ONLY candidate docs are re-tokenized —
    * the corpus-scale work stays in the first stage, exactly how a
    * 100 TB deployment runs late interaction (rerank cost is
    * q·k·|d|·|q_terms|, independent of corpus size). Term embeddings
    * are the md5-derived integer vectors above (a stand-in for a real
    * token encoder with the same dataflow: per-term vector join,
    * max-reduce over doc terms, sum-reduce over query terms), so the
    * score is an exact BIGINT both engines reproduce bit-for-bit.
    *
    * Returns (query_id, doc_id, maxsim, rerank) — `rerank` the
    * per-query dense order by (maxsim DESC, doc_id ASC). The per-query
    * window is candidate-sized (≤ k rows per query). */
  def maxSimRerank(docs: DataFrame, idCol: String, textCol: String,
                   queryTerms: DataFrame, candidates: DataFrame,
                   dim: Int = 8): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    import graft.functions.TextAnalysis.tokens
    def vec(prefix: String, term: Column) = struct(
      (0 until dim).map(j => termVecComponent(term, j).as(s"__${prefix}$j")): _*)
    // Candidate docs' DISTINCT terms: the doc-side scan is semi-joined
    // down to the ≤ q·k candidate ids BEFORE tokenizing (broadcast —
    // at scale this is the index/id-lookup read, not a corpus pass).
    val docTerms = docs
      .join(broadcast(candidates.select(col("doc_id").as("__cand_id")).distinct()),
        col(idCol) === col("__cand_id"), "left_semi")
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(tokens(col(textCol)))).as("__dterm"))
      .select(col("doc_id"), vec("d", col("__dterm")).as("__dv"))
    val qTerms = queryTerms.select(col("query_id"), col("term"),
      vec("q", col("term")).as("__qv"))
    val dot = (0 until dim)
      .map(j => col(s"__qv.__q$j") * col(s"__dv.__d$j"))
      .reduce(_ + _)
    // (query term × candidate doc term) pairs exist only inside a
    // candidate edge: join through the broadcast candidate list, then
    // two exact integer reductions (max over doc terms, sum over query
    // terms).
    val perTerm = broadcast(candidates.join(qTerms, Seq("query_id")))
      .join(docTerms, Seq("doc_id"))
      .groupBy(col("query_id"), col("doc_id"), col("term"))
      .agg(max(dot).as("__best"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("maxsim").desc, col("doc_id").asc)
    perTerm.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__best")).as("maxsim"))
      .withColumn("rerank", row_number().over(wr).cast("long"))
  }

  /** Number of term-hash partitions of the stored positional index.
    * Hash buckets, not raw terms: partitioning by term itself would
    * create one directory per vocabulary entry (millions at corpus
    * scale); 64 buckets keeps the listing O(1) while a phrase query
    * still prunes the scan to ≤ |phrase| buckets. */
  val posIndexBuckets = 64

  private def termBucket(term: Column): Column =
    pmod(NearDup.baseHash(term), lit(posIndexBuckets.toLong))

  /** Driver-side mirror of [[termBucket]] (same md5 first-8-hex-chars
    * slice as [[NearDup.baseHash]]), for pruning with literal terms. */
  private[operators] def termBucketLocal(term: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString
    math.floorMod(java.lang.Long.parseLong(hex.substring(0, 8), 16),
      posIndexBuckets.toLong)
  }

  /** Build a STORED positional inverted index: one row per token
    * occurrence (term, doc_id, pos — 0-based), laid out as parquet
    * partitioned by the term's hash bucket. The corpus pays this one
    * explode + write once; every later phrase/proximity query reads
    * only its own terms' buckets (static partition pruning on the
    * `bucket` literal set) instead of re-scanning 100 TB of text.
    * Same write-once/query-forever discipline as
    * [[Similarity.writeBucketedCorpus]]. */
  def writePositionalIndex(docs: DataFrame, idCol: String, textCol: String,
                           path: String): Unit =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(graft.functions.TextAnalysis.tokens(col(textCol)))
          .as(Seq("pos", "term")))
      .select(col("term"), col("doc_id"), col("pos").cast("long").as("pos"),
        termBucket(col("term")).as("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Exact phrase search over the stored positional index: the classic
    * positional-postings intersection. Posting list i (term w_i,
    * partition-pruned read) joins the running match set on
    * (doc_id, pos == first_pos + i) — an EQUI join on a composite
    * high-cardinality key (never a range/nested-loop), each side
    * already restricted to query-term postings, so the work is
    * Σ|postings(w_i)|, independent of corpus size. Output: one row per
    * doc containing the phrase, with occurrence count and first
    * (0-based) match position. Matching is exact on tokens (the index
    * stores tokens as written; normalize at write time if needed). */
  def phraseSearch(spark: SparkSession, indexPath: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val idx = spark.read.parquet(indexPath)
    // literal bucket equality PER TERM: each posting-list read statically
    // prunes to exactly its own term's bucket directory (a shared
    // union-of-buckets filter would make every per-term read scan up to
    // |phrase| directories — |phrase|× the IO for the same rows)
    def postings(term: String) =
      idx.filter(col("bucket") === termBucketLocal(term) &&
          col("term") === term)
        .select(col("doc_id"), col("pos"))
    val first = postings(phrase.head)
    val matches = phrase.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (term, i)) =>
        // distinct names on the probe side: both frames descend from
        // the same index scan, and identical names would force Spark's
        // ambiguous-self-join heuristics into the join condition
        val p = postings(term)
          .select(col("doc_id").as("__pdoc"), (col("pos") - i).as("__start"))
        acc.join(p, acc("doc_id") === p("__pdoc") &&
            acc("pos") === p("__start"))
          .select(acc("doc_id"), acc("pos"))
    }
    matches.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("pos")).as("first_pos"))
  }
}
