package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference apply: per word, each merge in learned order, greedy
    * leftmost non-overlapping — the executable spec the replace-chain
    * column form must match. */
  private def refEncode(text: String): Seq[String] = {
    def mergeOnce(toks: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer[String]()
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += toks(i); i += 1 }
      }
      out.toList
    }
    text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { w =>
      Bpe.merges.foldLeft(w.map(_.toString).toList) {
        case (toks, (a, b)) => mergeOnce(toks, a, b)
      }
    }
  }

  test("learned merge table is deterministic, non-trivial, lowercase-ASCII only") {
    assert(Bpe.merges.length == Bpe.numMerges,
      s"seed corpus must support $Bpe.numMerges merges, got ${Bpe.merges.length}")
    assert(Bpe.merges == Bpe.learn(Bpe.seedText, Bpe.numMerges), "learning must be deterministic")
    assert(Bpe.merges.distinct.length == Bpe.merges.length, "no duplicate merges")
    Bpe.merges.foreach { case (a, b) =>
      assert((a + b).forall(c => c >= 'a' && c <= 'z'), s"non-ASCII merge: ($a,$b)")
    }
    // frequent English units must emerge ("th"-like fusions)
    assert(Bpe.merges.exists { case (a, b) => a + b == "th" || a + b == "he" })
  }

  test("column encoding equals the reference per-word greedy apply") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "The Data PIPELINE  reads   and writes!"), // case, runs, punct
      (3L, "training tokens, packed into sequences (counted)."),
      (4L, "zzz qqq xxyzzy"),                          // unmergeable tail
      (5L, ""),                                        // empty
      (6L, "   "),                                     // blank
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), Bpe.tokens(col("text")).as("t"),
        Bpe.tokenCount(col("text")).as("n"))
      .as[(Long, Seq[String], Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    (1L to 6L).foreach { id =>
      val text = docs.filter(col("doc_id") === id).select("text").as[String].head()
      val want = refEncode(text)
      assert(got(id)._1 == want, s"doc $id: ${got(id)._1} != $want")
      assert(got(id)._2 == want.length)
    }
    assert(got(5L)._2 == 0 && got(6L)._2 == 0)
  }

  test("native graft_bpe_encode equals the replace-chain form on the documents fixture") {
    // The chain IS the executable spec (and the DuckDB oracle's shape);
    // the native expression must be indistinguishable on real corpus
    // text, punctuation and all.
    val docs = graft.Tables.documents(spark, sf0001).limit(200)
    val diff = docs.select(
        Bpe.tokens(col("text")).as("fast"),
        Bpe.chainTokens(col("text")).as("chain"))
      .filter(not(col("fast") === col("chain")))
    assert(diff.isEmpty, s"divergence: ${diff.head(3).mkString("; ")}")
  }

  test("merges never fire across word boundaries") {
    // The table's first merge (a,b) fuses within a word but must NOT
    // fuse "a b" written as two words.
    val (a, b) = Bpe.merges.head
    val df = Seq((1L, s"$a $b"), (2L, s"$a$b")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Bpe.tokens(col("text")))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq(a, b))
    assert(got(2L) == Seq(a + b))
  }

  test("trainDistributed reproduces the in-memory learner's merge table exactly") {
    // Same seed text, 30 rounds: the DataFrame trainer (vocab shrink →
    // weighted pair counts → argmax → fold re-segmentation) must learn
    // the IDENTICAL merge sequence — counts, tie-breaks and greedy
    // re-segmentation all agree or the first divergent round cascades.
    val seedDf = Seq(Bpe.seedText).toDF("text")
    assert(Bpe.trainDistributed(seedDf, "text", 30) == Bpe.learn(Bpe.seedText, 30))

    // and on the (multi-row, multi-partition) documents fixture: the
    // distributed trainer over 500 docs equals the in-memory learner on
    // their concatenation — word frequencies add, so the two must agree
    val docs = graft.Tables.documents(spark, sf0001).repartition(7)
    val concat = docs.select(col("text")).as[String].collect().mkString(" ")
    assert(Bpe.trainDistributed(docs, "text", 12) == Bpe.learn(concat, 12))
  }
}
