package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Document deduplication family for training-data pipelines:
  * exact (hash groupBy), MinHash+LSH (shingle→minhash→band→bucket join),
  * SimHash, and exact n-gram Jaccard on LSH candidates.
  *
  * Hash primitive: md5 (available and bit-identical in Spark and DuckDB)
  * truncated to 16 hex chars; MinHash takes the lexicographic min of the
  * seeded shingle hashes — string ordering is identical across engines,
  * so every stage is oracle-checkable.
  *
  * Scale: signatures are computed scan-side as array expressions (no
  * explode, no shuffle); the only shuffles are the band-bucket groupBy
  * (LSH candidates) and the final pair dedup. Bucket skew (a hot bucket
  * from boilerplate docs) is the known hazard — cap bucket size or salt
  * in production; AQE handles moderate skew.
  */
object NearDup {

  /** Exact dedup by normalized-content fingerprint: canonical doc =
    * min(doc_id) per fingerprint group (deterministic). */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** Seeded shingle hash: md5("<seed>:<shingle>") truncated. */
  private def seededHash(seed: Int, shingle: Column): Column =
    substring(md5(concat(lit(s"$seed:"), shingle)), 1, 16)

  /** MinHash signature: `numHashes` columns mh0..mh{n-1}, each the min
    * seeded hash over the document's `shingleSize`-gram shingles. Pure
    * projection — computed in the scan stage. Empty docs get null. */
  def minhashSignature(docs: DataFrame, idCol: String, textCol: String,
                       numHashes: Int, shingleSize: Int): DataFrame = {
    val sh = TextAnalysis.shingles(TextAnalysis.tokens(col(textCol)), shingleSize)
    val sig = (0 until numHashes).map { s =>
      array_min(transform(sh, x => seededHash(s, x))).as(s"mh$s")
    }
    docs.select(col(idCol) +: sig: _*)
  }

  /** LSH banding: split the signature into bands of `rowsPerBand`
    * hashes; a pair agreeing on ALL hashes of any band is a candidate.
    * Returns (band, band_key, id). */
  def lshBands(sig: DataFrame, idCol: String, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bands = (0 until numBands).map { b =>
      struct(lit(b).as("band"),
        concat((b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh$i")): _*).as("band_key"))
    }
    sig.select(col(idCol), explode(array(bands: _*)).as("bk"))
      .select(col(idCol), col("bk.band"), col("bk.band_key"))
  }

  /** Candidate near-dup pairs (a < b) from LSH buckets — the scalable
    * alternative to the O(n²) all-pairs join. */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 16, shingleSize: Int = 3,
                        rowsPerBand: Int = 2): DataFrame = {
    val sig = minhashSignature(docs, idCol, textCol, numHashes, shingleSize)
    val banded = lshBands(sig, idCol, numHashes, rowsPerBand)
    val a = banded.select(col("band"), col("band_key"), col(idCol).as("id_a"))
    val b = banded.select(col("band"), col("band_key"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs
    * (verification stage after LSH). Similarity rounded to 6 decimals. */
  def jaccardOnPairs(docs: DataFrame, pairs: DataFrame, idCol: String,
                     textCol: String, shingleSize: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("jid"),
      array_distinct(TextAnalysis.shingles(TextAnalysis.tokens(col(textCol)), shingleSize)).as("sh"))
    pairs
      .join(sh.withColumnRenamed("jid", "id_a").withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("jid", "id_b").withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6).as("jaccard"))
  }

  /** 32-bit SimHash over whitespace tokens: per-bit majority vote of
    * token hashes (bit set when strictly more weighted-ones than zeros).
    * Computed via explode + 32 conditional sums — one shuffle. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val h = conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
    val withH = toks.withColumn("h", h)
    val bitSums = (0 until 32).map { b =>
      sum((shiftright(col("h"), b).bitwiseAND(1) * 2 - 1)).as(s"s$b")
    }
    val sums = withH.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 32).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    sums.select(col(idCol), sim.cast("long").as("simhash"))
  }
}
