package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual bloom-filter runtime pre-filter — the semi-join-reduction
  * technique that matters at 100 TB: when a fact table joins a
  * selective dim, shuffling fact rows that cannot match is the
  * dominant wasted cost. A compact bit-set summary of the dim keys is
  * broadcast (here: folded into a literal, so the probe-side test is a
  * pure codegen'd scan filter), fact rows failing the test are dropped
  * BEFORE the shuffle, and the exact join afterwards removes the
  * bloom's false positives — so the result is IDENTICAL to the plain
  * join, only the shuffle volume changes.
  *
  * Spark's own runtime bloom (`spark.sql.optimizer.runtime.bloomFilter.
  * enabled`) and DPP cover common cases adaptively; this operator is
  * the explicit, engine-portable form: the md5-derived hash family is
  * deterministic, so any engine (and the DuckDB oracle) computes the
  * identical filter — which also makes the pruning itself
  * hash-checkable, not just the final result.
  */
object RuntimeFilter {

  /** The k bit positions of a key in an m-bit bloom filter: ONE md5 of
    * the key, sliced into k disjoint 8-hex (32-bit) windows, each mod
    * `bits` — the standard split-one-hash construction. One digest per
    * probe row instead of k (the md5 subtree is identical across the k
    * positions, so whole-stage codegen's subexpression elimination
    * computes it once); k ≤ 4 covers every practical bloom (FP rate
    * is minimized near k = m/n·ln2; callers needing more hashes want
    * more bits first). */
  def bloomPositions(key: Column, numHashes: Int, bits: Int): Seq[Column] = {
    require(numHashes >= 1 && numHashes * 8 <= 32,
      s"numHashes must be in [1, 4] (8 md5 hex chars per position): $numHashes")
    val h = md5(key.cast("string"))
    (0 until numHashes).map { i =>
      conv(substring(h, 1 + 8 * i, 8), 16, 10).cast("long") % bits
    }
  }

  /** Build the bloom bit-set from the (dim-scale) build side: one
    * explode + distinct caps the collect at `bits` rows regardless of
    * build cardinality — O(bits) driver memory, the same bounded
    * driver work a broadcast join's build side already pays. */
  def bloomBits(build: DataFrame, key: Column, numHashes: Int, bits: Int): Array[Boolean] = {
    require(bits > 0, s"bits must be positive: $bits")
    val set = new Array[Boolean](bits)
    build.select(explode(array(bloomPositions(key, numHashes, bits): _*)).as("p"))
      .distinct().collect().foreach(r => set(r.getLong(0).toInt) = true)
    set
  }

  /** Codegen'd membership test: all k positions set. The bit-set is a
    * single array LITERAL (one `Literal` of ArrayType, not a
    * 8192-way CreateArray), so the test runs inside whole-stage
    * codegen with zero joins and zero shuffles. */
  def mightContain(key: Column, set: Array[Boolean], numHashes: Int): Column =
    bloomPositions(key, numHashes, set.length)
      .map(p => element_at(typedLit(set.toSeq), (p + 1).cast("int")))
      .reduce(_ && _)

  /** Result-invariant bloom-prefiltered semi-join: probe rows failing
    * the bit test never reach the shuffle; survivors take the exact
    * semi-join, which removes the bloom's false positives. Identical
    * output to `probe SEMI JOIN build` for ANY (numHashes, bits) —
    * the knobs trade scan cost against shuffle reduction. */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                    buildKey: String, numHashes: Int = 3,
                    bits: Int = 8192): DataFrame = {
    val set = bloomBits(build, col(buildKey), numHashes, bits)
    probe.filter(mightContain(col(probeKey), set, numHashes))
      .join(build.select(col(buildKey).as(probeKey)).distinct(),
        Seq(probeKey), "left_semi")
  }
}
