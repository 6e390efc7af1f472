package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextAnalysis
import graft.operators.NearDup

/** Text-analysis + document-dedup queries over `documents` (SURVEY
  * EX-05/EX-07 and the training-data-pipeline dedup family), each with a
  * DuckDB oracle generated from the same constants. */
object TextQueries {

  /** DuckDB tokenization identical to [[TextAnalysis.tokens]] (empty
    * strings filtered, matching the Spark side's phantom-token guard). */
  private val toksSql =
    "list_filter(regexp_split_to_array(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '), x -> x <> '')"

  /** DuckDB 3-gram shingles identical to [[TextAnalysis.shingles]]. */
  private val shinglesSql =
    "list_transform(generate_series(1, len(toks)-2), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])"

  private val fingerprintSql =
    "substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 16)"

  private val NumHashes = 16
  private val RowsPerBand = 2

  /** Shared minhash CTE chain mirroring [[NearDup.minhashSignature]]:
    * tokens → shingles → ONE md5 base per shingle → 16 affine seeded
    * hashes (A_s·base + B_s mod P) → per-doc mins. Constants come from
    * the same [[NearDup]] definitions so both engines share the family.
    * `src` parameterizes the corpus CTE (dd10 runs the chain over the
    * quality-kept exact-dedup representatives instead of `documents`). */
  private def minhashCtesFrom(src: String): String = {
    val P = NearDup.HashP
    val mins = (0 until NumHashes)
      .map(s => s"min((${NearDup.hashA(s)} * hbase + ${NearDup.hashB(s)}) % $P) AS mh$s")
      .mkString(", ")
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM $src),
sh AS (SELECT doc_id, unnest($shinglesSql) AS shingle FROM t),
hb AS (SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS hbase FROM sh),
m AS (SELECT d.doc_id, ${(0 until NumHashes).map(i => s"mm.mh$i").mkString(", ")}
      FROM $src d LEFT JOIN
        (SELECT doc_id, $mins FROM hb GROUP BY doc_id) mm ON d.doc_id = mm.doc_id)"""
  }

  private val minhashCtes: String = minhashCtesFrom("documents")

  /** Exact-Jaccard verification CTEs over the LSH candidates (shared by
    * dd04 and dd07): long-form shingle sets, |A∩B| via equality join,
    * |A∪B| = |A|+|B|−|A∩B|. */
  private val jaccardCtes: String =
    """shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, count(*) AS ns FROM shd GROUP BY doc_id),
inter AS (SELECT c.id_a, c.id_b, count(*) AS ni
          FROM cand c
          JOIN shd sa ON sa.doc_id = c.id_a
          JOIN shd sb ON sb.doc_id = c.id_b AND sa.shingle = sb.shingle
          GROUP BY c.id_a, c.id_b),
jac AS (SELECT c.id_a, c.id_b,
               round(CAST(coalesce(i.ni, 0) AS DOUBLE) / (za.ns + zb.ns - coalesce(i.ni, 0)), 6) AS jaccard
        FROM cand c
        JOIN sizes za ON za.doc_id = c.id_a
        JOIN sizes zb ON zb.doc_id = c.id_b
        LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b)"""

  private val bandsCte: String = {
    val branches = (0 until NumHashes / RowsPerBand).map { b =>
      val key = (b * RowsPerBand until (b + 1) * RowsPerBand)
        .map(i => s"CAST(mh$i AS VARCHAR)").mkString(" || '_' || ")
      s"SELECT doc_id, $b AS band, $key AS band_key FROM m WHERE mh0 IS NOT NULL"
    }.mkString("\n  UNION ALL ")
    s"""bands AS (
  $branches
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)"""
  }

  val all: Seq[Q] = Seq(

    // EX-07: token counts, lexical diversity, mean token length, BPE-ish
    // token count — the quality-scoring feature set.
    Q("tx01_token_stats",
      (s, d) => {
        val docs = Tables.documents(s, d)
        docs.select(
          (col("doc_id") +: TextAnalysis.qualityMetrics(col("text")) :+
            TextAnalysis.tokenCountBpeIsh(col("text")).cast("int").as("n_bpe")): _*)
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks, text FROM documents)
              SELECT doc_id,
                CAST(len(toks) AS INTEGER) AS n_tokens,
                CAST(len(list_distinct(toks)) AS INTEGER) AS n_uniq_tokens,
                round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS ttr,
                round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 6) AS mean_token_len,
                CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS INTEGER) AS n_bpe
              FROM t""")),

    // EX-07: global term frequency (explode + count).
    Q("tx02_term_freq",
      (s, d) => Tables.documents(s, d)
        .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("n")),
      Some(s"""SELECT term, CAST(count(*) AS BIGINT) AS n FROM (
                SELECT unnest($toksSql) AS term FROM documents) t GROUP BY term""")),

    // Language-ID heuristic (stopword argmax) vs the declared lang —
    // corpus-scale explode/aggregate form (langIdAgg).
    Q("tx03_lang_id",
      (s, d) => TextAnalysis.langIdAgg(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("lang").as("lang_declared"), col("lang_guess")),
      Some {
        def hits(lang: String): String = {
          val set = TextAnalysis.stopwords(lang).map(w => s"'$w'").mkString(", ")
          s"len(list_filter(toks, x -> x IN ($set)))"
        }
        s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
             h AS (SELECT doc_id, lang, ${hits("en")} AS en, ${hits("es")} AS es, ${hits("de")} AS de FROM t)
            SELECT doc_id, lang AS lang_declared,
              CASE WHEN en >= es AND en >= de AND en > 0 THEN 'en'
                   WHEN es >= de AND es > 0 THEN 'es'
                   WHEN de > 0 THEN 'de'
                   ELSE 'und' END AS lang_guess
            FROM h"""
      }),

    // Document fingerprinting (normalized md5 prefix).
    Q("tx04_fingerprint",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint")),
      Some(s"SELECT doc_id, $fingerprintSql AS fingerprint FROM documents")),

    // Exact dedup: hash-groupBy on the fingerprint.
    Q("dd01_exact_dedup",
      (s, d) => NearDup.exactDedup(Tables.documents(s, d), "doc_id", "text"),
      Some(s"""SELECT $fingerprintSql AS fingerprint,
                 min(doc_id) AS canonical_id, CAST(count(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY 1""")),

    // MinHash signatures (16 seeded hashes over 3-gram shingles).
    Q("dd02_minhash_signature",
      (s, d) => NearDup.minhashSignature(Tables.documents(s, d), "doc_id", "text",
        NumHashes, 3),
      Some(s"WITH $minhashCtes SELECT * FROM m")),

    // MinHash LSH candidate pairs (8 bands × 2 rows).
    Q("dd03_minhash_candidates",
      (s, d) => NearDup.minhashCandidates(Tables.documents(s, d), "doc_id", "text",
        NumHashes, 3, RowsPerBand),
      Some(s"WITH $minhashCtes,\n$bandsCte SELECT id_a, id_b FROM cand")),

    // Exact 3-gram Jaccard on the LSH candidates (verify stage).
    Q("dd04_jaccard_pairs",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // jaccardOnPairs stages the candidate pairs and the candidate
        // shingle sets internally (eager localCheckpoint), so the LSH
        // chain and the tokenize→shingle chain each run exactly once.
        val pairs = NearDup.minhashCandidates(docs, "doc_id", "text",
          NumHashes, 3, RowsPerBand)
        NearDup.jaccardOnPairs(docs, pairs, "doc_id", "text", 3)
          .select("id_a", "id_b", "jaccard")
      },
      Some(s"""WITH $minhashCtes,
$bandsCte,
$jaccardCtes
SELECT id_a, id_b, jaccard FROM jac""")),

    // Canonical near-dup group assignment: min over self + strong
    // neighbors (jaccard ≥ 0.5) — one label-propagation step.
    Q("dd07_neardup_groups",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = NearDup.minhashCandidates(docs, "doc_id", "text",
          NumHashes, 3, RowsPerBand)
        // jac is consumed twice by neardupGroups (both edge directions)
        // — stage the (pair-scale) verified output once.
        val jac = NearDup.stage(
          NearDup.jaccardOnPairs(docs, pairs, "doc_id", "text", 3))
        NearDup.neardupGroups(docs, jac, "doc_id", 0.5)
      },
      Some(s"""WITH $minhashCtes,
$bandsCte,
$jaccardCtes,
nbr AS (
  SELECT id_a AS doc_id, id_b AS nbr FROM jac WHERE jaccard >= 0.5
  UNION ALL
  SELECT id_b, id_a FROM jac WHERE jaccard >= 0.5
)
SELECT d.doc_id,
       least(d.doc_id, coalesce(min(n.nbr), d.doc_id)) AS canonical_id
FROM documents d LEFT JOIN nbr n ON d.doc_id = n.doc_id
GROUP BY d.doc_id""")),

    // Full connected components over the verified near-dup graph:
    // min-label propagation to a FIXPOINT, so transitive chains
    // (A~B~C, A≁C) share one canonical id — the policy dd07's single
    // step only approximates. Oracle: recursive CTE computing each
    // doc's minimum reachable id over the strong-edge graph.
    Q("dd09_neardup_cc",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = NearDup.minhashCandidates(docs, "doc_id", "text",
          NumHashes, 3, RowsPerBand)
        val jac = NearDup.jaccardOnPairs(docs, pairs, "doc_id", "text", 3)
        NearDup.neardupComponents(docs, jac, "doc_id", 0.5)
      },
      Some(s"""WITH RECURSIVE $minhashCtes,
$bandsCte,
$jaccardCtes,
edges AS (
  SELECT id_a AS src, id_b AS dst FROM jac WHERE jaccard >= 0.5
  UNION ALL
  SELECT id_b, id_a FROM jac WHERE jaccard >= 0.5
),
reach AS (
  SELECT doc_id, doc_id AS r FROM documents
  UNION
  SELECT re.doc_id, e.dst AS r FROM reach re JOIN edges e ON e.src = re.r
)
SELECT doc_id, min(r) AS canonical_id FROM reach GROUP BY doc_id""")),

    // Full training-data dedup pipeline: quality gate → exact dedup
    // (shrink) → MinHash LSH + Jaccard on representatives → CC fixpoint
    // → doc-level canonical ids. The oracle composes the tx06 quality
    // predicate, the fingerprint window, the minhash chain over the
    // representative set, and the recursive-CTE components.
    Q("dd10_dedup_pipeline",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val m = docs.select(
          (Seq(col("doc_id"), col("text")) ++ TextAnalysis.qualityMetrics(col("text"))): _*)
        val kept = m.filter(
          col("n_tokens").between(20, 2000) &&
          col("ttr") >= 0.3 &&
          col("mean_token_len").between(2.0, 12.0)).select("doc_id", "text")
        NearDup.canonicalize(kept, "doc_id", "text", NumHashes, 3, RowsPerBand, 0.5)
      },
      Some(s"""WITH RECURSIVE
kept AS (SELECT doc_id, text FROM (SELECT doc_id, text, $toksSql AS toks FROM documents) kq
         WHERE len(toks) BETWEEN 20 AND 2000
           AND round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) >= 0.3
           AND round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 6) BETWEEN 2.0 AND 12.0),
em AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS exact_canon
       FROM (SELECT doc_id, $fingerprintSql AS fp FROM kept) x),
reps AS (SELECT k.doc_id, k.text FROM kept k
         JOIN em e ON e.doc_id = k.doc_id AND e.exact_canon = k.doc_id),
${minhashCtesFrom("reps")},
$bandsCte,
$jaccardCtes,
edges AS (
  SELECT id_a AS src, id_b AS dst FROM jac WHERE jaccard >= 0.5
  UNION ALL
  SELECT id_b, id_a FROM jac WHERE jaccard >= 0.5
),
reach AS (
  SELECT doc_id, doc_id AS r FROM reps
  UNION
  SELECT re.doc_id, e.dst AS r FROM reach re JOIN edges e ON e.src = re.r
),
cc AS (SELECT doc_id, min(r) AS canonical_id FROM reach GROUP BY doc_id)
SELECT e.doc_id, cc.canonical_id FROM em e JOIN cc ON cc.doc_id = e.exact_canon""")),

    // Bigram (2-gram shingle) frequency — n-gram analysis over the
    // corpus via the shared shingle pipeline.
    Q("tx05_bigram_freq",
      (s, d) => NearDup.shingleRows(Tables.documents(s, d), "doc_id", "text", 2)
        .groupBy(col("shingle")).agg(count(lit(1)).as("n"))
        .withColumnRenamed("shingle", "bigram"),
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
b AS (SELECT unnest(list_transform(generate_series(1, len(toks)-1),
                                   i -> toks[i] || ' ' || toks[i+1])) AS bigram FROM t)
SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY bigram""")),

    // Corpus bigram-frequency quality score — perplexity proxy: mean
    // ln(corpus frequency) of each doc's bigrams; low = gibberish.
    Q("tx09_bigram_score",
      (s, d) => TextAnalysis.bigramLogFreqScore(Tables.documents(s, d), "doc_id", "text"),
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
b AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)-1),
                                           i -> toks[i] || ' ' || toks[i+1])) AS bigram FROM t),
f AS (SELECT bigram, count(*) AS n FROM b GROUP BY bigram),
s AS (SELECT b.doc_id, round(avg(ln(n)), 6) AS bigram_logfreq
      FROM b JOIN f USING (bigram) GROUP BY b.doc_id)
SELECT d.doc_id, s.bigram_logfreq FROM documents d LEFT JOIN s USING (doc_id)""")),

    // Deterministic train/val/test split (90/5/5): md5-bucket ranges —
    // reproducible across engines/runs/partitionings, no RNG.
    Q("tx10_deterministic_split",
      (s, d) => Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.deterministicSplit(col("doc_id"), 90, 5).as("split")),
      Some("""SELECT doc_id,
               CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
              FROM (SELECT doc_id,
                      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
                    FROM documents) t""")),

    // SimHash (32-bit, per-bit majority of token hashes).
    Q("dd05_simhash",
      (s, d) => NearDup.simhash(Tables.documents(s, d), "doc_id", "text"),
      Some(s"WITH $simhashCtes SELECT doc_id, simhash FROM sim")),

    // SimHash near-dup pairs via byte-band pigeonhole (exact for
    // hamming ≤ 3 with 4 bands).
    Q("dd08_simhash_neardup",
      (s, d) => NearDup.simhashNearDup(Tables.documents(s, d), "doc_id", "text", 3, 4),
      Some {
        val branches = (0 until 4)
          .map(b => s"SELECT doc_id, simhash, $b AS band, (simhash >> ${b * 8}) & 255 AS band_key FROM sim")
          .mkString("\n  UNION ALL ")
        s"""WITH $simhashCtes,
bands AS (
  $branches
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""
      }),

    // Winnowing fingerprints (MOSS): min hash of each sliding window of
    // 4 consecutive 3-gram hashes, distinct per doc.
    Q("tx08_winnowing",
      (s, d) => TextAnalysis.winnowingFingerprints(
        Tables.documents(s, d), "doc_id", "text", 3, 4),
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
shp AS (SELECT doc_id,
               unnest(generate_series(1, len(toks)-2)) AS pos,
               unnest($shinglesSql) AS shingle
        FROM t),
hb AS (SELECT doc_id, pos,
              CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h
       FROM shp),
wm AS (SELECT doc_id,
              min(h) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
              lead(h, 3) OVER (PARTITION BY doc_id ORDER BY pos) AS lst
       FROM hb)
SELECT DISTINCT doc_id, wmin AS fingerprint FROM wm WHERE lst IS NOT NULL""")),

    // Unicode canonicalization: NFC composition of an injected
    // combining sequence ("a" + U+0301 → "á") and accent stripping —
    // the normalize-before-fingerprint step of text dedup. Oracle uses
    // DuckDB's native nfc_normalize / strip_accents.
    Q("tx07_unicode_normalize",
      (s, d) => {
        val decomposed = concat(col("text"), lit(" suffix_á"))
        val accented = translate(col("text"), "ae", "áé")
        Tables.documents(s, d).select(
          col("doc_id"),
          graft.functions.Cleaning.normalizeUnicode(decomposed, "NFC").as("nfc"),
          graft.functions.Cleaning.stripAccents(accented).as("sin_acentos"))
      },
      Some("""SELECT doc_id,
               nfc_normalize(text || ' suffix_a' || chr(769)) AS nfc,
               strip_accents(translate(text, 'ae', chr(225) || chr(233))) AS sin_acentos
              FROM documents""")),

    // Quality filter: the keep/drop decision of a training-data
    // pipeline, from the tx01 metric set.
    Q("tx06_quality_filter",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val m = docs.select(
          (col("doc_id") +: TextAnalysis.qualityMetrics(col("text"))): _*)
        m.withColumn("keep",
          col("n_tokens").between(20, 2000) &&
          col("ttr") >= 0.3 &&
          col("mean_token_len").between(2.0, 12.0))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents)
              SELECT doc_id,
                CAST(len(toks) AS INTEGER) AS n_tokens,
                CAST(len(list_distinct(toks)) AS INTEGER) AS n_uniq_tokens,
                round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS ttr,
                round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 6) AS mean_token_len,
                (len(toks) BETWEEN 20 AND 2000
                  AND round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) >= 0.3
                  AND round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 6) BETWEEN 2.0 AND 12.0) AS keep
              FROM t""")),
  )

  /** Shared simhash CTE chain mirroring [[NearDup.simhash]]. */
  private lazy val simhashCtes: String = {
    val sums = (0 until 32)
      .map(b => s"sum(((h >> $b) & 1) * 2 - 1) AS s$b").mkString(", ")
    val bits = (0 until 32)
      .map(b => s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
hh AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h FROM tok),
sums AS (SELECT doc_id, $sums FROM hh GROUP BY doc_id),
sim AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM sums)"""
  }
}
