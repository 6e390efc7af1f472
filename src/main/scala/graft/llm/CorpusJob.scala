package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Html, LangId, TextAnalysis, Url}
import graft.operators.{NearDup, Packing, Sampling}
import graft.sinks.Publish

/** The end-to-end LLM corpus-build job (round-17 verdict item 1) — the
  * composition the four mandated operator families exist for, run as
  * ONE staged pipeline with an atomic publish (the
  * [[graft.his.TurnosJob]] treatment applied to the LLM surface):
  *
  *   1. HTML → text extraction ([[Html.extractBlocks]], tx43's
  *      operator) — the crawl landing format in front of everything;
  *   2. URL canonicalization → registered-domain provenance key
  *      ([[Url.registeredDomain]], tx45);
  *   3. trained language ID with 'und' abstention routing
  *      ([[LangId.classifyAbstain]], tx44/tx44c) — low-confidence docs
  *      leave the corpus instead of mis-keying it;
  *   4. quality gate (tx06's thresholds) → exact-shrink + MinHash-LSH
  *      connected-components dedup keeping canonical representatives
  *      ([[NearDup.canonicalize]], dd10) → cross-doc duplicated-span
  *      STRIP over the survivors ([[NearDup.stripDuplicatedSpans]],
  *      dd15);
  *   5. per-domain token-budget mixing ([[Sampling.tokenBudgetMix]],
  *      tx31's rule keyed by the REGISTERED DOMAIN — the provenance
  *      key governance policy is actually written against);
  *   6. deterministic shard assignment + manifest
  *      ([[Packing.shardAssignments]]/[[Packing.shardManifest]], tx41)
  *      and an all-or-nothing publish ([[Publish.publishTables]]).
  *
  * Stage sharing is the TurnosJob doctrine: every frame with multiple
  * consumers (the lexified corpus, the trained model, the dedup
  * survivors, the final assignments) is staged exactly once — without
  * it each downstream stage re-runs the whole extract→train→dedup
  * tree, turning the job into sum-of-standalone-queries (the
  * wideExtract lesson, measured ~2× per re-read).
  *
  * Scale shape: every stage is the oracle-proven scale-safe form —
  * codegen expression chains for extract/URL (no UDFs), the broadcast
  * langs×dim model, banded LSH (never all-pairs), star-contracted CC,
  * one range shuffle for the shard prefix (never a global window).
  * The oracle-checked composition query (tx46_corpus_e2e) hashes the
  * per-shard manifest of the SAME chain, so membership drift anywhere
  * in the six stages is a correctness failure, not a silent skew.
  *
  * The fixture carries plain text and no URLs, so the QUERY layer
  * synthesizes the hostile HTML page and the URL per doc (the tx43 /
  * tx45 synthesis, passed in as columns) and lexifies the extracted
  * text per the fixture `lang` (the tx44 treatment) — the pipeline
  * itself is fixture-agnostic. */
object CorpusJob {

  /** Published version (None when the input was empty — OP-33's
    * short-circuit) and the per-stage survivor ledger. */
  case class Result(published: Option[String], counts: Map[String, Long])

  private val Dim = 64
  private val NumShards = 8
  private val ShardSeed = "tx46"

  /** The curated shard-assignment frame — the SHARED chain of the
    * oracle-checked query and the publishing job. Input `docs` must
    * carry (doc_id, lang, source, text); `htmlCol`/`urlCol` are the
    * page and URL for each doc (synthesized from the fixture at the
    * query layer, real columns in production).
    * Output: (doc_id, lang, lang_pred, domain, n_tokens, shard) plus
    * the internal `__sh_*` columns [[Packing.shardManifest]] consumes. */
  def curatedAssignments(docs: DataFrame, htmlCol: Column,
                         urlCol: Column): DataFrame = {
    // 1+2: extract text from HTML; registered-domain provenance key.
    // One projection pass — both are codegen expression chains.
    val extracted = NearDup.fanOut(docs)
      .select(col("doc_id"), col("lang"), col("source"),
      array_join(Html.extractBlocks(htmlCol), " ").as("text"),
      Url.registeredDomain(Url.host(urlCol)).as("domain"))
    // Lexified corpus staged ONCE (tx44's doctrine): it feeds NB
    // training, classification, the quality gate, and dedup.
    val lex = NearDup.stage(extracted.select(col("doc_id"), col("lang"),
      col("domain"), LangId.lexify(col("text"), col("lang")).as("text")))
    // 3: train on the deterministic 80% split, classify with
    // abstention, route 'und' out of the corpus. The gram counts are
    // staged ONCE and shared by training (filtered to the split —
    // identical rows to gramCounts(train)) and classification, so the
    // O(chars) explode+md5 pass runs once (round-18 optimization).
    val split = TextAnalysis.deterministicSplit(col("doc_id"), 80, 10)
    val gc = NearDup.stage(LangId.gramCounts(lex, "doc_id", "text", Dim))
    val train = lex.filter(split === "train")
    val model = NearDup.stage(LangId.trainNaiveBayesFromGrams(
      gc.filter(split === "train"), train, "doc_id", "lang", Dim))
    val routed = lex
      .join(LangId.classifyAbstainFromGrams(gc, model, "doc_id"),
        Seq("doc_id"))
      .filter(col("lang_pred") =!= "und")
    // 4a: quality gate (tx06's thresholds).
    val metrics = routed.select(
      (Seq(col("doc_id"), col("lang"), col("lang_pred"), col("domain"),
        col("text")) ++ TextAnalysis.qualityMetrics(col("text"))): _*)
    // staged: feeds canonicalize (which reads it ~4 times), the
    // survivor semi-join, and the strip below — unstaged each re-ran
    // the classify-join + metrics chain (round 18).
    val kept = NearDup.stage(metrics.filter(
      col("n_tokens").between(20, 2000) && col("ttr") >= 0.3 &&
        col("mean_token_len").between(2.0, 12.0))
      .select("doc_id", "lang", "lang_pred", "domain", "text"))
    // 4b: exact shrink + LSH CC; keep each component's canonical rep.
    val labels = NearDup.canonicalize(kept, "doc_id", "text")
    val survivors = NearDup.stage(kept.join(
      labels.filter(col("canonical_id") === col("doc_id")).select("doc_id"),
      Seq("doc_id"), "left_semi"))
    // 4c: strip cross-doc duplicated 5-gram spans from the survivors;
    // the post-strip token count is the corpus-mass currency downstream.
    val stripped = NearDup.stripDuplicatedSpans(survivors, "doc_id", "text", 5)
      .select(col("doc_id"), col("n_kept"))
      .join(survivors.select("doc_id", "lang", "lang_pred", "domain"),
        Seq("doc_id"))
    // 5: token-budget mix keyed by the registered domain.
    val mixed = Sampling.tokenBudgetMix(stripped, "doc_id", "domain",
      col("n_kept"), budgetFrac = 0.6, alpha = 0.5)
    // 6: deterministic shard assignment over the selected docs.
    Packing.shardAssignments(
      mixed.select(col("doc_id"), col("lang"), col("lang_pred"),
        col("domain"), col("n_kept").as("n_tokens")),
      "doc_id", col("n_tokens"), NumShards, ShardSeed)
  }

  /** Per-shard receipt of an assignments frame (tx41's contract). */
  def manifest(assigned: DataFrame): DataFrame =
    Packing.shardManifest(assigned, "doc_id")

  /** Stage → atomically publish. Published tables:
    *  - `corpus_shards` (doc_id, lang, lang_pred, domain, n_tokens,
    *    shard), partitioned by shard — what a training run reads;
    *  - `shard_manifest` — the per-shard receipt;
    *  - `domain_ledger` — per-domain doc/token rollup of the published
    *    corpus (the governance artifact).
    * All-or-nothing through [[Publish.publishTables]]: readers see the
    * old version or the new one, never a mix; a failed write leaves
    * the current version untouched. Empty input short-circuits without
    * touching the target (OP-33's rule). */
  def run(spark: SparkSession, sfDir: String, outRoot: String,
          version: String): Result = {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source", "text")
    if (docs.isEmpty) return Result(None, Map.empty)
    val staged = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def stage(df: DataFrame): DataFrame = {
      val s = df.localCheckpoint(true); staged += s; s
    }
    try {
      val assigned = stage(curatedAssignments(docs,
        graft.queries.TextQueries.fixtureHtmlCol,
        graft.queries.TextQueries.fixtureUrlCol))
      val shards = assigned.drop("__sh_rk", "__sh_t")
      val ledger = assigned.groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
      Publish.publishTables(spark,
        Map("corpus_shards" -> shards,
          "shard_manifest" -> manifest(assigned),
          "domain_ledger" -> ledger),
        outRoot, version,
        partitioning = Map("corpus_shards" -> Seq("shard")))
      Result(Some(s"v-$version"), Map(
        "docs_in" -> docs.count(),
        "published" -> assigned.count()))
    } finally {
      staged.foreach(df =>
        try df.unpersist() catch { case _: Throwable => () })
    }
  }
}
