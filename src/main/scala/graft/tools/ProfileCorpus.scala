// Dev tool: stage-by-stage wall-clock profile of the LLM corpus job
// (tx46 / llm_job_e2e — the two most expensive bench entries in r16).
// Usage: sbt -batch "runMain graft.tools.ProfileCorpus <sfDir>"
package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Html, LangId, TextAnalysis, Url}
import graft.operators.{NearDup, Packing, Sampling}

object ProfileCorpus {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    def t[A](label: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def stage(df: DataFrame): DataFrame = df.localCheckpoint(true)

    val total0 = System.nanoTime()
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source", "text")
    val htmlCol = graft.queries.TextQueries.fixtureHtmlCol
    val urlCol = graft.queries.TextQueries.fixtureUrlCol
    val Dim = 64

    // mirror of CorpusJob.curatedAssignments, stage-timed
    val extracted = docs.select(col("doc_id"), col("lang"), col("source"),
      array_join(Html.extractBlocks(htmlCol), " ").as("text"),
      Url.registeredDomain(Url.host(urlCol)).as("domain"))
    val lex = t("1_extract_lexify")(stage(extracted.select(col("doc_id"), col("lang"),
      col("domain"), LangId.lexify(col("text"), col("lang")).as("text"))))
    val split = TextAnalysis.deterministicSplit(col("doc_id"), 80, 10)
    val gc = t("2a_gram_counts")(stage(LangId.gramCounts(lex, "doc_id", "text", Dim)))
    val train = lex.filter(split === "train")
    val model = t("2_nb_train")(stage(LangId.trainNaiveBayesFromGrams(
      gc.filter(split === "train"), train, "doc_id", "lang", Dim)))
    val routed = t("3_classify_route")(stage(lex
      .join(LangId.classifyAbstainFromGrams(gc, model, "doc_id"),
        Seq("doc_id"))
      .filter(col("lang_pred") =!= "und")))
    val metrics = routed.select(
      (Seq(col("doc_id"), col("lang"), col("lang_pred"), col("domain"),
        col("text")) ++ TextAnalysis.qualityMetrics(col("text"))): _*)
    val kept = t("4a_quality_gate")(stage(metrics.filter(
      col("n_tokens").between(20, 2000) && col("ttr") >= 0.3 &&
        col("mean_token_len").between(2.0, 12.0))
      .select("doc_id", "lang", "lang_pred", "domain", "text")))
    val labels = t("4b_canonicalize")(stage(NearDup.canonicalize(kept, "doc_id", "text")))
    val survivors = t("4b_survivors")(stage(kept.join(
      labels.filter(col("canonical_id") === col("doc_id")).select("doc_id"),
      Seq("doc_id"), "left_semi")))
    val stripped = t("4c_strip_spans")(stage(
      NearDup.stripDuplicatedSpans(survivors, "doc_id", "text", 5)
        .select(col("doc_id"), col("n_kept"))
        .join(survivors.select("doc_id", "lang", "lang_pred", "domain"),
          Seq("doc_id"))))
    val mixed = t("5_budget_mix")(stage(Sampling.tokenBudgetMix(stripped, "doc_id", "domain",
      col("n_kept"), budgetFrac = 0.6, alpha = 0.5)))
    val assigned = t("6_shard_assign")(stage(Packing.shardAssignments(
      mixed.select(col("doc_id"), col("lang"), col("lang_pred"),
        col("domain"), col("n_kept").as("n_tokens")),
      "doc_id", col("n_tokens"), 8, "tx46")))
    t("7_manifest")(Packing.shardManifest(assigned, "doc_id")
      .write.format("noop").mode("overwrite").save())
    println(f"PROF total ${(System.nanoTime() - total0) / 1e9}%.2f s")
    spark.stop()
  }
}
