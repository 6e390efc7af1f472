package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def toks(s: String): Seq[String] =
    Seq(s).toDF("t").select(TextAnalysis.tokens(col("t")).as("r"))
      .as[Seq[String]].collect().head

  test("tokens: whitespace runs collapse; blank input yields EMPTY array") {
    assert(toks("  a   b\tc ") == Seq("a", "b", "c"))
    assert(toks("") == Seq.empty)
    assert(toks("   \t ") == Seq.empty)
    assert(toks("solo") == Seq("solo"))
  }

  test("shingles: n-grams in order; short docs yield empty") {
    def sh(s: String, n: Int): Seq[String] =
      Seq(s).toDF("t")
        .select(TextAnalysis.shingles(TextAnalysis.tokens(col("t")), n).as("r"))
        .as[Seq[String]].collect().head
    assert(sh("a b c d", 3) == Seq("a b c", "b c d"))
    assert(sh("a b", 3) == Seq.empty)
    assert(sh("a b", 2) == Seq("a b"))
  }

  test("langIdHeuristic detects stopword-dominant language, und otherwise") {
    val df = Seq(
      "the cat sat on the mat and the dog",
      "el perro y la casa de los gatos",
      "der Hund und die Katze mit der Maus",
      "zzz qqq xxx").toDF("t")
      .select(TextAnalysis.langIdHeuristic(col("t")).as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "es", "de", "und"))
  }

  test("langIdAgg (explode form) equals langIdHeuristic (array form)") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog"),
      (2L, "el perro y la casa de los gatos"),
      (3L, "der Hund und die Katze mit der Maus"),
      (4L, "zzz qqq xxx"),
      (5L, ""), // token-less doc must survive as "und"
      (6L, "the el der the el der"), // cross-language tie -> en priority
    ).toDF("doc_id", "text")
    val viaAgg = TextAnalysis.langIdAgg(docs, "doc_id", "text")
      .select("doc_id", "lang_guess").as[(Long, String)].collect().toMap
    val viaExpr = docs
      .select(col("doc_id"), TextAnalysis.langIdHeuristic(col("text")).as("g"))
      .as[(Long, String)].collect().toMap
    assert(viaAgg == viaExpr)
    assert(viaAgg(5L) == "und" && viaAgg(6L) == "en")
  }

  test("fingerprint is whitespace/case-insensitive, content-sensitive") {
    val fp = Seq(("  Hello   World ", 1), ("hello world", 2), ("hello worlds", 3))
      .toDF("t", "i")
      .select(TextAnalysis.fingerprint(col("t")).as("f")).as[String].collect()
    assert(fp(0) == fp(1))
    assert(fp(0) != fp(2))
    assert(fp(0).length == 16)
  }

  test("winnowing: shared long runs share a fingerprint; short docs yield none") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "zz one two three four five six seven eight nine ten"), // shifted copy
      (3L, "totally different words appear in this other document here"),
      (4L, "too short"),
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowingFingerprints(docs, "doc_id", "text", 3, 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // docs 1 and 2 share a 10-token run ≥ windowSize+shingleSize-1 = 6
    assert((fp(1L) & fp(2L)).nonEmpty, "shared run must share a fingerprint")
    assert((fp(1L) & fp(3L)).isEmpty)
    assert(!fp.contains(4L)) // 2 tokens -> 0 shingles -> no fingerprints
  }

  test("qualityMetrics: counts, ttr, mean token length") {
    val row = Seq("aa bb aa cccc").toDF("text")
      .select(TextAnalysis.qualityMetrics(col("text")): _*).collect().head
    assert(row.getInt(0) == 4)            // n_tokens
    assert(row.getInt(1) == 3)            // n_uniq_tokens
    assert(row.getDouble(2) == 0.75)      // ttr
    assert(row.getDouble(3) == 2.5)       // mean_token_len
  }

  test("removeBoilerplateLines drops corpus-frequent lines, keeps order, counts removals") {
    import spark.implicits._
    val header = "COOKIE BANNER ACCEPT ALL"
    val docs = Seq(
      (1L, s"$header\nunique article one\nsecond line one"),
      (2L, s"$header\nunique article two"),
      (3L, s"$header\nunique article three"),
      (4L, "no banner here at all"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplateLines(docs, "doc_id", "text", 0.5)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("unique article one\nsecond line one", 1L)))
    assert(out(2L) == (("unique article two", 1L)))
    assert(out(4L) == (("no banner here at all", 0L)))
    // a doc that is ALL boilerplate survives as empty, still present
    val allBoiler = TextAnalysis.removeBoilerplateLines(
      docs.unionAll(Seq((5L, header)).toDF("doc_id", "text")), "doc_id", "text", 0.5)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(allBoiler(5L) == (("", 1L)))
  }

  test("bigramLogFreqScore: repeated-phrase docs outscore gibberish; short docs null") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "zxqv wplk njhg bcde trewq yuiop asdfg hjklz"), // gibberish: unique bigrams
      (4L, "one"),                                          // < 2 tokens → null
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogFreqScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(4L).isEmpty)
    // docs 1/2 share every bigram (freq 2 → ln 2); gibberish freq 1 → ln 1 = 0
    assert(out(1L).get == out(2L).get)
    assert(out(1L).get > out(3L).get)
    assert(out(3L).get == 0.0)
  }

  test("bigramLmScore: hand-computed smoothed conditional cross-entropy; short docs null") {
    import spark.implicits._
    // V = {a,b,c} = 3; bigram counts: "a b"→3, "b a"→1; context counts:
    // a→3, b→1. P(b|a) = (3+1)/(3+3), P(a|b) = (1+1)/(1+3).
    val docs = Seq(
      (1L, "a b a b"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None
         else Some((r.getLong(1), r.getDouble(2), r.getDouble(3))))).toMap
    assert(out(3L).isEmpty, "single-token doc has no bigrams")
    val pba = 4.0 / 6; val pab = 2.0 / 4
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ce1 = r6(-(math.log(pba) * 2 + math.log(pab)) / 3)
    val ce2 = r6(-math.log(pba))
    assert(out(1L).get == ((3L, ce1, r6(math.exp(ce1)))))
    assert(out(2L).get == ((1L, ce2, r6(math.exp(ce2)))))
    // doc1 carries the rare "b a" bigram → strictly higher ce than
    // doc2, which is purely the modal bigram
    assert(ce1 > ce2)
  }

  test("scrubPii redacts emails, IPs, phones; leaves prose and ordinary numbers") {
    import spark.implicits._
    val out = Seq(
      "mail me at jane.doe+x@sub.example.org today",
      "server 192.168.0.1 and phone +595 21 555 1234 ok",
      "version 2.5 costs 42 dollars in 1999",
    ).toDF("t").select(TextAnalysis.scrubPii(col("t"))).as[String].collect()
    assert(out(0) == "mail me at <EMAIL> today")
    assert(out(1) == "server <IP> and phone <PHONE> ok")
    assert(out(2) == "version 2.5 costs 42 dollars in 1999", "no false positives")
  }

  test("contaminatedDocs flags exactly the docs sharing an n-gram with eval") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),   // shares the eval 3-gram
      (2L, "totally unrelated text right here"),
      (3L, "beta gamma delta elsewhere placed"), // shares too
      (4L, "al pha be ta"),                      // similar words, no shared 3-gram
    ).toDF("doc_id", "text")
    val ev = Seq((100L, "x beta gamma delta y")).toDF("doc_id", "text")
    val got = TextAnalysis.contaminatedDocs(corpus, ev, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
  }

  test("repetitionMetrics: looping text scores high, varied text low, short null") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"), // one bigram, all dup 5-grams
      (2L, "one two three four five six seven eight"), // all n-grams unique
      (3L, "tiny doc"),                                // bigram yes, no 5-gram
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
         Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(got(1L) == ((Some(1.0), Some(1.0))))
    assert(got(2L)._1.get < 0.2 && got(2L)._2.get == 0.0)
    assert(got(3L) == ((Some(1.0), None)), "no 5-gram → null metric")
  }

  test("bigramLogFreqScore: zipfian head broadcasts; split equals plain join") {
    import spark.implicits._
    import graft.operators.NearDup
    // 80%+ of all bigram occurrences are the two hot bigrams of the
    // repeated phrase — the "of the"-class zipfian head.
    val docs = (1 to 50).map { i =>
      (i.toLong, ("of the " * 8) + s"rare$i only$i once$i")
    }.toDF("doc_id", "text")
    val split = TextAnalysis.bigramLogFreqScore(docs, "doc_id", "text", headK = 2)
    // reference: the un-split formulation (one shuffled equi-join)
    val bg = NearDup.shingleRows(docs, "doc_id", "text", 2)
      .select(col("doc_id"), col("shingle").as("bigram"))
    val freq = bg.groupBy(col("bigram")).agg(count(lit(1)).as("n"))
    val plain = bg.join(freq, Seq("bigram")).groupBy(col("doc_id"))
      .agg(round(avg(log(col("n").cast("double"))), 6).as("bigram_logfreq"))
    val sm = split.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pm = plain.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sm == pm, "head/tail split must not change any score")
    // plan gate: hot rows resolve via a broadcast join of the staged head
    val plan = split.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the head lookup must broadcast:\n$plan")
  }

  test("charEntropy: 0 for one repeated char, ln(k) for uniform, null for empty") {
    import spark.implicits._
    val docs = Seq((1L, "aaaaaa"), (2L, "abab"), (3L, "abcd"), (4L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got(1L).contains(0.0))
    assert(got(2L).contains(BigDecimal(math.log(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(got(3L).contains(BigDecimal(math.log(4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(got(4L).isEmpty, "empty doc → null entropy")
  }

  test("charEntropy counts CODE POINTS: repeated non-BMP char has zero entropy") {
    import spark.implicits._
    // A surrogate-pair emoji repeated: code-unit splitting would see two
    // distinct halves (entropy ln 2); character-based oracles see one.
    val docs = Seq((1L, "😀😀")).toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.0)
  }

  test("tfidfTopTerms: naive reference match; head/tail split invariant") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana banana date"),
      (3L, "apple elderberry"),
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 2, headK = 2)
      .select($"doc_id", $"term", $"tfidf", $"rank")
      .as[(Long, String, Double, Int)].collect().sortBy(r => (r._1, r._4))
    // naive reference: explicit tf/df over the 4-doc corpus (N counts
    // the empty doc too — corpus size, not indexed-doc count)
    val n = 4.0
    val tf = Map((1L, "apple") -> 2L, (1L, "banana") -> 1L, (1L, "cherry") -> 1L,
      (2L, "banana") -> 2L, (2L, "date") -> 1L,
      (3L, "apple") -> 1L, (3L, "elderberry") -> 1L)
    val df = Map("apple" -> 2L, "banana" -> 2L, "cherry" -> 1L,
      "date" -> 1L, "elderberry" -> 1L)
    def score(d: Long, t: String): Double =
      BigDecimal(tf((d, t)) * math.log(n / df(t)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = tf.keys.toSeq
      .map { case (d, t) => (d, t, score(d, t)) }
      .groupBy(_._1).toSeq.flatMap { case (_, ts) =>
        ts.sortBy(x => (-x._3, x._2)).take(2).zipWithIndex
          .map { case ((d, t, s), i) => (d, t, s, i + 1) }
      }.sortBy(r => (r._1, r._4))
    assert(got.toSeq == want)
    assert(!got.exists(_._1 == 4L), "token-less docs have no terms")
    // split invariance: all-hot (huge head) == mostly-cold (head of 1)
    val allHot = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 2, headK = 1000)
      .select($"doc_id", $"term", $"tfidf", $"rank")
      .as[(Long, String, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val mostlyCold = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 2, headK = 1)
      .select($"doc_id", $"term", $"tfidf", $"rank")
      .as[(Long, String, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(allHot.toSeq == mostlyCold.toSeq)
  }

  test("dedupParagraphs: corpus-first occurrence wins, within-doc repeats drop, order kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha\nshared\nbeta\nshared"), // within-doc repeat of 'shared'
      (2L, "shared\ngamma"),               // cross-doc repeat (doc 1 pos 1 wins)
      (3L, "shared"),                      // doc emptied entirely
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupParagraphs(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ("alpha\nshared\nbeta", 3L))
    assert(out(2L) == ("gamma", 1L))
    assert(out(3L) == ("", 0L))
  }

  test("chunkDocs: full coverage with exact overlap; tail kept; empty→1 chunk; null→0") {
    import spark.implicits._
    val docs = Seq(
      (1L, Option("a" * 10)),  // len == window: exactly 1 chunk
      (2L, Option(('a' to 'z').mkString)), // 26 chars, window 10 stride 7 → 4 chunks
      (3L, Option("")),        // empty doc: one empty chunk
      (4L, Option.empty[String]), // null text: no chunks
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocs(docs, "doc_id", "text", 10, 3)
      .as[(Long, Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(out(1L).map(_._4).toSeq == Seq("a" * 10))
    val c2 = out(2L).map(r => (r._3, r._4)).toSeq
    assert(c2 == Seq(
      (0L, "abcdefghij"), (7L, "hijklmnopq"), (14L, "opqrstuvwx"), (21L, "vwxyz")))
    // consecutive chunks share exactly `overlap` chars; concatenating
    // each chunk's non-overlapped prefix reconstructs the doc
    assert(c2.sliding(2).forall {
      case Seq((_, a), (_, b)) => a.takeRight(3) == b.take(3)
      case _ => true
    })
    assert(c2.init.map(_._2.take(7)).mkString + c2.last._2 == ('a' to 'z').mkString)
    assert(out(3L).map(r => (r._2, r._4)).toSeq == Seq((0L, "")))
    assert(!out.contains(4L))
  }

  test("bm25: tf raises score, doc length damps it, rare terms outweigh common ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat dog cat"),            // tf(cat)=2, short
      (2L, "cat dog"),                // tf(cat)=1, short
      (3L, "cat " + ("pad " * 40)),   // tf(cat)=1, long → damped below doc 2
      (4L, "dog dog dog"),            // no 'cat'; 'dog' is common (3 of 5 docs)
      (5L, "emu"),                    // rare term, one doc
    ).toDF("doc_id", "text")
    def scores(terms: String*): Map[Long, Double] =
      TextAnalysis.bm25(docs, "doc_id", "text", terms.toSeq)
        .as[(Long, Double)].collect().toMap
    val cat = scores("cat")
    assert(cat(1L) > cat(2L), "higher tf must score higher at equal length")
    assert(cat(2L) > cat(3L), "longer doc must damp an equal tf")
    assert(!cat.contains(4L) && !cat.contains(5L), "docs without the term are absent")
    // idf: 'emu' (df=1) must outweigh 'dog' (df=3) at equal tf and length
    val mixed = scores("dog", "emu")
    assert(mixed(5L) > mixed(2L), "rare term must outweigh common term")
  }
}
