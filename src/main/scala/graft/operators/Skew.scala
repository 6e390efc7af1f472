package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for joins whose key distribution has hot
  * keys too large for one task even after AQE's skew-join splitting
  * (AQE splits the skewed SIDE's partitions, but every split still
  * reads the full matching build side — salting spreads the PROBE
  * work too).
  *
  * Salted join: the skewed (large) side gets a uniform random-ish salt
  * in [0, buckets); the replicated (small) side is exploded once per
  * salt value; the join key becomes (key, salt). Row multiplication is
  * `buckets`× on the small side only. Results are identical to the
  * plain join for equi-join semantics (inner/left on the skewed side).
  */
object Skew {

  /** Deterministic salt from a row-unique column — stable across
    * retries (a `rand()` salt breaks task-retry idempotence: a retried
    * task would re-salt differently and rows could be lost or doubled
    * under speculative execution). */
  def salt(uniqueCol: Column, buckets: Int): Column =
    pmod(xxhash64(uniqueCol), lit(buckets))

  /** Inner/left equi-join `skewed ⋈ small` on `key`, salted into
    * `buckets` sub-keys. `uniqueCol` must be row-unique on the skewed
    * side (drives the deterministic salt). */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
                 uniqueCol: String, buckets: Int,
                 joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // Salting replicates the small side `buckets`×, which is only
    // semantics-preserving when unmatched small-side rows are dropped:
    // right/full/semi/anti joins would emit the replicas.
    require(Set("inner", "left", "leftouter").contains(
      joinType.toLowerCase.replace("_", "")),
      s"saltedJoin preserves semantics only for inner/left joins, got '$joinType'")
    val saltedLeft = skewed.withColumn("__salt", salt(col(uniqueCol), buckets))
    val replicated = small
      .withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    saltedLeft.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
