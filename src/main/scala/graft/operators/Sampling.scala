package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mixing for training corpora.
  *
  * Every decision is a pure projection of the row's id (md5 bucket) — no
  * RNG, no state, no shuffle: the same doc gets the same fate on any
  * engine, any run, any partitioning, which is what makes a 100 TB
  * sampling pass reproducible (and oracle-checkable). Complements
  * [[graft.functions.TextAnalysis.deterministicSplit]] (train/val/test)
  * with per-stratum rates and epoch-weighted mixing.
  */
object Sampling {

  /** Uniform deterministic bucket in [0, mod): first 8 md5 hex chars of
    * the stringified id, mod `mod`. */
  def hashBucket(id: Column, mod: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % mod

  /** Copies of a row under rate `r` (mixing weight): floor(r) guaranteed
    * epochs plus one more for the id-bucket fraction `r - floor(r)` of
    * rows — so a stratum with rate 2.5 is upsampled ×2.5 in expectation
    * with EXACTLY floor/ceil copies per row, and rate 0.25 keeps a
    * deterministic quarter. Fractions are fixed to basis points at plan
    * time (integer compare — no per-row float math). */
  private def copiesFor(rate: Double, bucket: Column): Column = {
    require(rate >= 0, s"negative sampling rate: $rate")
    val whole = math.floor(rate).toInt
    val fracBp = math.round((rate - whole) * 10000).toInt
    lit(whole) + when(bucket < fracBp, 1).otherwise(0)
  }

  /** Per-stratum copy count: `rates` maps stratum value → rate (values
    * > 1 upsample, < 1 downsample), unmatched strata get `defaultRate`.
    * Pure codegen'd CASE chain over the (tiny, plan-time) rate map. */
  def mixCopies(id: Column, strata: Column, rates: Map[String, Double],
                defaultRate: Double): Column = {
    val b = hashBucket(id, 10000)
    rates.toSeq.sortBy(_._1).foldRight(copiesFor(defaultRate, b)) {
      case ((k, r), alt) => when(strata === k, copiesFor(r, b)).otherwise(alt)
    }
  }

  /** Epoch-materialized stratified mix — the sampling-weights pass of a
    * training-data pipeline: each row appears `mixCopies` times with an
    * `epoch` column (1..copies). Rows with 0 copies drop out. The
    * explode multiplies rows AFTER all per-row work, so upstream
    * operators see each doc once; `sequence` is guarded (Spark's
    * sequence(1, 0) would count DOWN, not return empty). */
  def stratifiedMix(df: DataFrame, idCol: String, strataCol: String,
                    rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val copies = mixCopies(col(idCol), col(strataCol), rates, defaultRate)
    df.withColumn("__copies", copies)
      .withColumn("epoch",
        explode(when(col("__copies") > 0, sequence(lit(1), col("__copies")))
          .otherwise(typedLit(Seq.empty[Int]))))
      .drop("__copies")
  }
}
