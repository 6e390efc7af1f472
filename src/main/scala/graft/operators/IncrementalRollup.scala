package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance with mergeable partial-agg state —
  * the batch analogue of a streaming materialized view: a published
  * rollup is updated from a delta batch WITHOUT rescanning the facts it
  * already covers.
  *
  * State per key is the classic mergeable-summary tuple
  * (n, Σ as DECIMAL, min, max): counts and decimal sums add, min/max
  * combine — so `merge(state(base), state(delta)) == state(base ∪ delta)`
  * exactly (decimal summation is order-independent; this is the same
  * numeric discipline the whole oracle suite uses). Derived measures
  * (avg) are computed only at [[finalize]] time from the merged state.
  *
  * Scale shape: `state(delta)` is one hash agg over the delta only
  * (map-side partials), `merge` shuffles STATE-sized data (|keys| rows,
  * not |facts|), and the base facts are never re-read — at 100 TB this
  * is the difference between an O(delta) nightly refresh and an O(total)
  * recompute. The same state tuple is what a Structured Streaming
  * aggregation keeps per key, so a batch rollup maintained this way can
  * be handed over to a streaming job without re-bootstrapping.
  */
object IncrementalRollup {

  /** Partial-agg state for `valueCol` grouped by `keys`:
    * (n BIGINT, s DECIMAL, mn DOUBLE, mx DOUBLE). */
  def state(facts: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    facts.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol).cast("decimal(18,2)")).as("s"),
      min(col(valueCol).cast("double")).as("mn"),
      max(col(valueCol).cast("double")).as("mx"))

  /** Merge two state tables (associative + commutative — any number of
    * deltas can fold in, in any order). */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b).groupBy(keys.map(col): _*).agg(
      sum(col("n")).cast("long").as("n"),
      sum(col("s")).as("s"),
      min(col("mn")).as("mn"),
      max(col("mx")).as("mx"))

  /** Resolve state to the user-facing rollup. DECIMAL never reaches the
    * output schema (driver-gate canon rule): the sum lands as a rounded
    * DOUBLE. The average is derived in INTEGER space — cents·100 div n,
    * then an exact double division by 10⁴ — because double rounding at
    * an exact .5 digit is engine-dependent (Spark rounds the shortest
    * decimal repr HALF_UP, DuckDB rounds the binary value), whereas
    * 64-bit integer division is bit-identical everywhere. Truncating vs
    * flooring div only differs on negative sums; values are monetary
    * non-negatives here (document at the call site if that changes). */
  def finalize(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(
      col("n"),
      round(col("s").cast("double"), 2).as("total"),
      col("mn"), col("mx"),
      (expr("(CAST(s * 100 AS BIGINT) * 100) DIV n").cast("double") / 10000)
        .as("avg_v")): _*)

  /** First-order delta of a JOIN view under append-only deltas on BOTH
    * inputs (the incremental-view-maintenance algebra, cf. DBToaster,
    * Koch et al., VLDB'14 §2): with L' = L ∪ ΔL and R' = R ∪ ΔR,
    *
    *   Δ(L ⋈ R) = (ΔL ⋈ R) ∪ (L ⋈ ΔR) ∪ (ΔL ⋈ ΔR)
    *
    * — three joins whose inputs each include at least one DELTA side,
    * so refresh cost is O(Δ · matches), never a rescan-and-rejoin of
    * the two 100 TB bases (the base-⋈-base term is exactly the one the
    * algebra avoids). The three terms are disjoint by construction
    * (every joined pair has a distinct old/delta provenance), so the
    * union is duplicate-free and feeds [[state]]/[[merge]] directly:
    * merge(state(L ⋈ R), state(joinViewDelta(...))) == state(L' ⋈ R').
    * Append-only contract: deltas are INSERTS; updates/deletes need
    * the signed (multiplicity ±1) extension. */
  def joinViewDelta(lOld: DataFrame, lDelta: DataFrame,
                    rOld: DataFrame, rDelta: DataFrame,
                    keys: Seq[String]): DataFrame =
    lDelta.join(rOld, keys)
      .unionByName(lOld.join(rDelta, keys))
      .unionByName(lDelta.join(rDelta, keys))
}
