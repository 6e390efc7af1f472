package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for LLM pretraining: concatenate documents in a
  * deterministic order and cut the stream into fixed token-budget
  * chunks ("concat-and-chunk" packing). The core primitive is a
  * GLOBAL running total that never funnels the data through one
  * partition — the naive empty-partition running-sum window is a
  * single-task sort at fact scale (the same hazard
  * [[Dedup.denseIdScalable]] exists to avoid).
  */
object Packing {

  /** Global running total of integral `value` in the total order
    * `order`, with exactly ONE shuffle: range-repartition on the order
    * columns (partition p holds a contiguous key range), sort within
    * partitions, then a per-partition streaming accumulation offset by
    * the preceding partitions' totals. The totals are one
    * O(partitions)-row collect — the same bounded driver work
    * [[Dedup.denseIdScalable]]'s zipWithIndex does.
    *
    * Deliberately RDD-based past the shuffle: the DataFrame
    * formulation (window partitioned by `spark_partition_id()`) plans
    * a SECOND full hash exchange, because Catalyst cannot know the
    * range partitioning already co-locates the window's partition key
    * (measured on tx16's plan). The per-partition totals pass reuses
    * the shuffle files (skipped map stage), so the data moves once.
    *
    * `order` must be a total order for a deterministic result (add a
    * unique tiebreaker). `value` must be non-null integral. Adds
    * `name` as the INCLUSIVE running total (callers wanting the
    * exclusive prefix subtract `value`). */
  def runningTotal(df: DataFrame, order: Seq[Column], value: Column,
                   name: String): DataFrame = {
    val spark = df.sparkSession
    val prepared = df.withColumn("__rt_v", value.cast(LongType))
      .repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val vIdx = prepared.schema.fieldIndex("__rt_v")
    val rdd = prepared.rdd
    val sums = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(vIdx))
      Iterator(pid -> s)
    }.collect().sortBy(_._1)
    val offsets: Map[Int, Long] = sums
      .scanLeft(0 -> 0L) { case ((_, acc), (pid, s)) => pid -> (acc + s) }
      .sliding(2).collect { case Array((_, acc), (pid, _)) => pid -> acc }
      .toMap
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = StructType(prepared.schema.fields :+
      StructField(name, LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bc.value.getOrElse(pid, 0L)
      it.map { r => acc += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ acc) }
    }
    spark.createDataFrame(out, schema).drop("__rt_v")
  }

  /** Contiguous-fill packing: docs are laid out in `order` as one
    * token stream cut into `budget`-sized chunks; each doc gets its
    * stream `start_offset` and the `chunk` its first token lands in —
    * the standard GPT-style packing layout (docs may straddle chunk
    * boundaries; the trainer's loader handles the split). One range
    * shuffle end-to-end; no global sort task. */
  def packSequences(df: DataFrame, order: Seq[Column], tokens: Column,
                    budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    runningTotal(df.withColumn("__pk_t", tokens), order, col("__pk_t"), "__cum")
      .withColumn("start_offset", (col("__cum") - col("__pk_t")).cast(LongType))
      .withColumn("chunk", floor(col("start_offset") / lit(budget)).cast(LongType))
      .drop("__cum", "__pk_t")
  }
}
