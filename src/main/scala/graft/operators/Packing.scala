package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate documents in a
  * deterministic order and cut the stream into fixed token-budget
  * chunks ("concat-and-chunk" packing). The core primitive is a
  * GLOBAL running total that never funnels the data through one
  * partition — the naive empty-partition running-sum window is a
  * single-task sort at fact scale (the same hazard
  * [[Dedup.denseIdScalable]] exists to avoid).
  */
object Packing {

  /** Global running total of `value` in the total order `order`,
    * WITHOUT a single-partition window: range-repartition on the order
    * columns (partition p holds a contiguous key range), sort within
    * partitions, then per-partition prefix windows shifted by the
    * preceding partitions' totals. The per-partition totals are one
    * O(partitions)-row aggregate collected to the driver and folded
    * into a literal lookup map — the same bounded driver work
    * [[Dedup.denseIdScalable]]'s zipWithIndex does, with zero extra
    * joins (the map literal stays inside codegen).
    *
    * `order` must be a total order for a deterministic result (add a
    * unique tiebreaker). `value` must be non-null. Adds `name` as the
    * INCLUSIVE running total (callers wanting the exclusive prefix
    * subtract `value`). */
  def runningTotal(df: DataFrame, order: Seq[Column], value: Column,
                   name: String): DataFrame = {
    val ranged = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
    val perPart = ranged.groupBy(col("__pid"))
      .agg(sum(value).cast("long").as("__psum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] = perPart
      .scanLeft(0 -> 0L) { case ((_, acc), (pid, s)) => pid -> (acc + s) }
      .sliding(2).collect { case Array((_, acc), (pid, _)) => pid -> acc }
      .toMap
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val base =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(offsets), col("__pid")), lit(0L))
    ranged
      .withColumn(name, (base + sum(value).over(w)).cast("long"))
      .drop("__pid")
  }

  /** Contiguous-fill packing: docs are laid out in `order` as one
    * token stream cut into `budget`-sized chunks; each doc gets its
    * stream `start_offset` and the `chunk` its first token lands in —
    * the standard GPT-style packing layout (docs may straddle chunk
    * boundaries; the trainer's loader handles the split). One range
    * shuffle + per-partition windows; no global sort task. */
  def packSequences(df: DataFrame, order: Seq[Column], tokens: Column,
                    budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    runningTotal(df, order, tokens, "__cum")
      .withColumn("start_offset", (col("__cum") - tokens).cast("long"))
      .withColumn("chunk", floor(col("start_offset") / lit(budget)).cast("long"))
      .drop("__cum")
  }
}
