package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINED language identification — the operator that closes the
  * loop the fixtures leave open: `documents.lang` is consumed by the
  * governance/mixing queries (tx18/tx28) but nothing infers it. This
  * is a multinomial Naive Bayes over HASHED CHARACTER BIGRAMS — the
  * classic langid feature (char n-grams survive code-mixing and typos
  * where word lists fail), trained distributed with the repo's
  * determinism discipline:
  *
  *  - "training" is COUNTING (one hash aggregation per table — no
  *    iteration, no learning rate): per-(lang, dim) gram counts with
  *    Laplace-1 smoothing, per-lang doc counts for the prior;
  *  - every model parameter is an exact-integer MICRO-NAT
  *    (`round(ln(p)·1e6)` as BIGINT), so scoring is pure integer
  *    arithmetic — `score = prior6 + Σ count·loglik6` — with NO
  *    float-summation order anywhere (the tx42 rounding discipline,
  *    hardened from round-6 doubles to scaled integers);
  *  - the argmax tiebreak is pinned (max score, then MIN lang), so
  *    the whole train→score→predict pipeline hash-checks against a
  *    DuckDB oracle that reproduces the training itself.
  *
  * Scale shape: gram explosion is map-side (O(chars) rows keyed by
  * doc), the model is (langs × dim) rows — broadcast-sized at any
  * corpus scale — and every shuffle is keyed by doc_id or the
  * (lang, dim) pair. No driver-side state at all. */
object LangId {

  /** Deterministic multilingual LEXIFIER for fixture synthesis: the
    * fixtures' text is English-vocabulary regardless of the `lang`
    * column, so there is nothing for a classifier to learn from the
    * raw bytes. This maps a sample of the vocabulary to per-language
    * surface forms (public dictionary words — the Gender-map
    * treatment), giving each language distinctive character bigrams
    * while unmapped words stay as-is (realistic code-mixed text).
    * ONE definition feeds the Spark map literal and the generated
    * oracle CASE chain. */
  val Lexicon: Map[String, Map[String, String]] = Map(
    "es" -> Map(
      "table" -> "tabla", "query" -> "consulta", "fast" -> "rápido",
      "value" -> "valor", "row" -> "fila", "key" -> "llave",
      "data" -> "datos", "window" -> "ventana", "the" -> "el",
      "a" -> "un", "order" -> "orden", "group" -> "grupo",
      "slow" -> "lento", "line" -> "línea"),
    "fr" -> Map(
      "table" -> "tableau", "query" -> "requête", "fast" -> "vite",
      "value" -> "valeur", "row" -> "ligne", "key" -> "clé",
      "data" -> "données", "window" -> "fenêtre", "the" -> "le",
      "a" -> "une", "order" -> "ordre", "group" -> "groupe",
      "slow" -> "lent", "line" -> "trait"),
    "de" -> Map(
      "table" -> "tabelle", "query" -> "abfrage", "fast" -> "schnell",
      "value" -> "wert", "row" -> "zeile", "key" -> "schlüssel",
      "data" -> "daten", "window" -> "fenster", "the" -> "das",
      "a" -> "ein", "order" -> "reihenfolge", "group" -> "gruppe",
      "slow" -> "langsam", "line" -> "zeile"),
    "zh" -> Map(
      "table" -> "表格", "query" -> "查询", "fast" -> "快速",
      "value" -> "数值", "row" -> "行列", "key" -> "键值",
      "data" -> "数据", "window" -> "窗口", "the" -> "这个",
      "a" -> "一个", "order" -> "顺序", "group" -> "分组",
      "slow" -> "缓慢", "line" -> "线条"),
  ) // "en" = identity

  private lazy val lexFlat: Map[String, String] =
    Lexicon.flatMap { case (lang, m) =>
      m.map { case (w, t) => s"$lang:$w" -> t }
    }

  /** Per-language surface form of `textCol` under [[Lexicon]]. */
  def lexify(textCol: Column, langCol: Column): Column = {
    val lex = typedLit(lexFlat)
    array_join(transform(TextAnalysis.tokens(textCol),
      t => coalesce(element_at(lex, concat(langCol, lit(":"), t)), t)), " ")
  }

  /** The identical lexifier as DuckDB SQL (`toksExpr` must be the
    * token-list expression, `langExpr` the lang column). The coalesce
    * pins the empty-text edge (round-17 ADVICE): Spark's array_join
    * over an empty token list yields '', but DuckDB's list_aggregate
    * yields NULL — unpinned, an empty doc would get a padded-bigram
    * prediction in the engine and VANISH from the oracle's gram chain. */
  def lexifySql(toksExpr: String, langExpr: String): String = {
    val cases = lexFlat.toSeq.sorted.map { case (k, v) =>
      s"WHEN '${k.replace("'", "''")}' THEN '$v'"
    }.mkString(" ")
    s"coalesce(list_aggregate(list_transform($toksExpr, " +
      s"x -> CASE $langExpr || ':' || x $cases ELSE x END), 'string_agg', ' '), '')"
  }

  /** Hashed char-bigram rows (id, dim_idx, c): text padded with one
    * space each side (word-boundary grams carry signal), bigram g at
    * every char offset, dim = md5(g) first-8-hex mod `dim`. */
  def gramCounts(docs: DataFrame, idCol: String, textCol: String,
                 dim: Int): DataFrame = {
    val padded = concat(lit(" "), col(textCol), lit(" "))
    // Bigrams via two aligned code-point slices zipped — O(len) per
    // doc. The previous `transform(sequence(1, len-1), i =>
    // padded.substr(i, 2))` form re-evaluated `padded` (a concat
    // allocating len+2 chars) inside the lambda for EVERY character
    // position — O(len²) bytes copied per doc, the dominant cost of
    // the tx44 family at bench scale. regexp_extract_all with (?s).
    // splits into CODE POINTS, matching substr()'s code-point
    // semantics exactly.
    val chars = regexp_extract_all(padded, lit("(?s)."), lit(0))
    val n = greatest(size(chars) - 1, lit(0))
    val grams = transform(
      arrays_zip(slice(chars, lit(1), n).as("a"), slice(chars, lit(2), n).as("b")),
      x => concat(x.getField("a"), x.getField("b")))
    graft.operators.NearDup.fanOut(docs)
      .select(col(idCol), explode(grams).as("g"))
      .select(col(idCol),
        (conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long") % dim)
          .as("dim_idx"))
      .groupBy(col(idCol), col("dim_idx"))
      .agg(count(lit(1)).as("c"))
  }

  /** NB parameters from a labeled training frame: one row per
    * (label, dim_idx) with `loglik6` = round(ln((cnt+1)/(tot+dim))·1e6)
    * and the label's `prior6` = round(ln(nDocs_l/N)·1e6). Every label
    * carries ALL `dim` rows (unseen dims get the smoothing floor). */
  def trainNaiveBayes(train: DataFrame, idCol: String, textCol: String,
                      labelCol: String, dim: Int): DataFrame =
    trainNaiveBayesFromGrams(gramCounts(train, idCol, textCol, dim),
      train, idCol, labelCol, dim)

  /** [[trainNaiveBayes]] over PRECOMPUTED gram counts
    * (`gramCounts(train, idCol, textCol, dim)` — or a staged all-docs
    * gram frame filtered to the training split, which is the same
    * rows). Lets a query that both trains and classifies stage the
    * gram explosion ONCE instead of running the O(chars) explode+md5
    * pass twice (the round-18 tx44-family optimization). */
  def trainNaiveBayesFromGrams(trainGrams: DataFrame, train: DataFrame,
                               idCol: String, labelCol: String,
                               dim: Int): DataFrame = {
    val grams = trainGrams
      .join(train.select(col(idCol), col(labelCol).as("label")), Seq(idCol))
    val cnt = grams.groupBy(col("label"), col("dim_idx"))
      .agg(sum(col("c")).as("cnt"))
    val tot = cnt.groupBy(col("label")).agg(sum(col("cnt")).as("tot"))
    val nd = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("nd"))
    val n = train.select(count(lit(1)).as("n"))
    val dims = nd.select(col("label"))
      .crossJoin(dimRange(nd, dim))
    dims.join(cnt, Seq("label", "dim_idx"), "left")
      .join(tot, Seq("label"))
      .join(nd, Seq("label")).crossJoin(n)
      .select(col("label"), col("dim_idx"),
        round(log((coalesce(col("cnt"), lit(0L)) + 1).cast("double") /
          (col("tot") + dim).cast("double")) * 1e6, 0).cast("long")
          .as("loglik6"),
        round(log(col("nd").cast("double") / col("n").cast("double")) * 1e6, 0)
          .cast("long").as("prior6"))
  }

  private def dimRange(any: DataFrame, dim: Int): DataFrame =
    any.sparkSession.range(dim).select(col("id").as("dim_idx"))

  /** Score + predict: per doc, `argmax_label prior6 + Σ c·loglik6`
    * (exact integers; tie → MIN label). The model frame is
    * (labels × dim) rows — the join broadcasts at any corpus scale.
    * The argmax is ONE doc-keyed window over the (docs × labels)
    * score frame (row_number on score DESC, label ASC — the pinned
    * tiebreak), not a max+self-join: the join form evaluates the
    * whole explode→join→agg score subtree twice (measured 2× on the
    * bench), while the window costs one doc-keyed shuffle of 5·n
    * rows. Partitioned by the doc id, so it scales — never a global
    * window. */
  def classify(docs: DataFrame, model: DataFrame, idCol: String,
               textCol: String, dim: Int): DataFrame =
    classifyFromGrams(gramCounts(docs, idCol, textCol, dim), model, idCol)

  /** [[classify]] over precomputed gram counts (see
    * [[trainNaiveBayesFromGrams]]). */
  def classifyFromGrams(grams: DataFrame, model: DataFrame,
                        idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score").desc, col("label").asc)
    scoreFrame(grams, model, idCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("label").as("lang_pred"))
  }

  /** Abstention margin in micro-nats (2 nats): a prediction whose
    * integer score beats the runner-up by less than this routes to
    * 'und' instead — real pipelines send those docs to a slower
    * classifier or human review rather than mis-keying them. Pinned
    * integer, shared with the generated oracle SQL. */
  val AbstainMargin6: Long = 2000000L

  /** [[classify]] with abstention: top-1 must beat top-2 by
    * [[AbstainMargin6]] micro-nats or the doc predicts 'und'
    * (round-17 verdict item 6 — the closed-set classifier gains a
    * low-confidence route). The window carries ONLY row_number (a
    * lead() in the same window would block Spark's
    * InferWindowGroupLimit — the PlanSpec sweep), so the top-2 cut
    * runs as a per-partition bounded heap; the margin rule is then one
    * doc-keyed pivot agg over ≤ 2 rows per doc. A single-candidate doc
    * is confident by construction (coalesce pins the margin). */
  def classifyAbstain(docs: DataFrame, model: DataFrame, idCol: String,
                      textCol: String, dim: Int): DataFrame =
    classifyAbstainFromGrams(gramCounts(docs, idCol, textCol, dim),
      model, idCol)

  /** [[classifyAbstain]] over precomputed gram counts (see
    * [[trainNaiveBayesFromGrams]]). */
  def classifyAbstainFromGrams(grams: DataFrame, model: DataFrame,
                               idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score").desc, col("label").asc)
    scoreFrame(grams, model, idCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 2)
      .groupBy(col(idCol))
      .agg(max(when(col("__rn") === 1, col("label"))).as("__l1"),
        max(when(col("__rn") === 1, col("score"))).as("__s1"),
        max(when(col("__rn") === 2, col("score"))).as("__s2"))
      .select(col(idCol),
        when(col("__s1") - coalesce(col("__s2"),
          col("__s1") - AbstainMargin6) >= AbstainMargin6, col("__l1"))
          .otherwise(lit("und")).as("lang_pred"))
  }

  /** Per-(doc, label) integer scores — the shared subtree of
    * [[classify]] / [[classifyAbstain]], over a gram-count frame. */
  private def scoreFrame(grams: DataFrame, model: DataFrame,
                         idCol: String): DataFrame =
    grams
      .join(broadcast(model), Seq("dim_idx"))
      .groupBy(col(idCol), col("label"))
      .agg((first(col("prior6")) + sum(col("c") * col("loglik6")))
        .as("score"))
}
