package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cleaning

/** Wide↔long reshaping.
  *
  * The reference stores up to 11 "prestaciones" denormalized across 11
  * columns and re-normalizes them with a PHP loop (reference:
  * src/Command/EtlHisTurnosCommand.php:173-201 — SURVEY OP-20). Here the
  * same reshape is Spark's native `unpivot` (a single Generate node, no
  * shuffle) plus the non-empty gate.
  */
object Reshape {

  /** Unpivot `valueCols` into (slot, value) rows, keeping `idCols`;
    * drops null/blank values and trims — exactly the reference's
    * per-column gate + trim (EtlHisTurnosCommand.php:175-176).
    * The slot index is retained because the reference's insert order
    * (and hence pivot-table ids) depends on column position. */
  def unpivotNonEmpty(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
                      slotName: String, valueName: String): DataFrame = {
    val long = df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray, slotName, valueName)
    long
      .filter(Cleaning.nonEmpty(col(valueName)))
      .withColumn(valueName, trim(col(valueName)))
      // slot arrives as the source column NAME; keep a sortable ordinal.
      .withColumn(slotName, regexp_extract(col(slotName), "(\\d+)$", 1).cast("int"))
  }

  /** N-way repeated dimension join (SURVEY OP-13): the same dimension
    * joined once per FK-ish column — the reference's 11 `Prestaciones`
    * left joins on 11 denormalized columns. Semantically equivalent to
    * unpivot→single-join→pivot; ReshapeSpec asserts the equivalence.
    * Keys are trimmed before the lookup (the reference trims on
    * unpivot).
    *
    * Scale note: the dim is materialized ONCE to a driver-local
    * relation before the joins — the reference's own in-memory-cache
    * design (EtlHisTurnosCommand.php:114). A dim being broadcast N ways
    * must fit in driver/executor memory by definition, so collecting it
    * is always safe here. The alternatives measured worse: without it,
    * AQE materializes N independent BroadcastQueryStages each
    * recomputing a derived dim's whole pipeline (11× recompute); with
    * `dim.persist()`, the N parallel broadcast stages race to fill the
    * cache and it's slower still (68.6s → 112.4s bench total at sf0.1).
    * A LocalRelation costs one computation and makes each broadcast a
    * trivial in-memory copy.
    *
    * `maxDimRows` + `maxDimBytes` guard the collect: a "dimension" that
    * turns out to be fact-sized must fail FAST with a clear message,
    * not OOM the driver mid-collect. Row count alone is not enough —
    * 2M wide rows can be multi-GB — so a small probe collect estimates
    * the average row size and converts `maxDimBytes` into a row cap
    * BEFORE the full collect runs; wide-row dims trip the guard having
    * collected only the probe. */
  def repeatedDimJoin(df: DataFrame, dim: DataFrame, dimKey: String, dimVal: String,
                      fkCols: Seq[String], outPrefix: String,
                      maxDimRows: Int = 2000000,
                      maxDimBytes: Long = 256L << 20): DataFrame = {
    val spark = df.sparkSession
    val kv = dim.select(col(dimKey), col(dimVal))
    val probeN = 4096
    val probe = kv.limit(probeN + 1).collect()
    val avgBytes =
      if (probe.isEmpty) 0L
      else math.max(16L,
        org.apache.spark.util.SizeEstimator.estimate(
          probe.asInstanceOf[AnyRef]) / probe.length)
    val rowCap = math.min(maxDimRows.toLong,
      if (avgBytes == 0L) maxDimRows.toLong else maxDimBytes / avgBytes)
    def fail(n: Long): Nothing = throw new IllegalArgumentException(
      s"repeatedDimJoin: dim exceeds the broadcast guard (> $n rows at " +
        s"~$avgBytes bytes/row; caps: $maxDimRows rows, $maxDimBytes bytes) " +
        s"— it is not broadcast-sized; join the unpivoted long form " +
        s"instead (see unpivotNonEmpty)")
    if (probe.length > rowCap) fail(rowCap)
    val rows =
      if (probe.length <= probeN) probe
      else {
        val all = kv.limit(rowCap.toInt + 1).collect()
        if (all.length > rowCap) fail(rowCap)
        all
      }
    val localDim = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), kv.schema)
    fkCols.zipWithIndex.foldLeft(df) { case (acc, (fk, i)) =>
      acc.join(
        broadcast(localDim.select(col(dimKey).as(s"__k$i"), col(dimVal).as(s"$outPrefix$i"))),
        trim(col(fk)) === col(s"__k$i"), "left_outer")
        .drop(s"__k$i")
    }
  }

  /** Pivot the first `n` rows per group (ranked by `order`, a total order
    * within the group) into `n` slot columns `prefix0..prefix{n-1}` —
    * the inverse reshape, used to synthesize the reference's wide-extract
    * shape from long fact data. One shuffle (the groupBy). */
  def pivotSlots(df: DataFrame, groupCol: String, valueCol: Column, order: Seq[Column],
                 n: Int, prefix: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    val ranked = df.withColumn("__slot_rn", row_number().over(w)).filter(col("__slot_rn") <= n)
    val aggs = (0 until n).map { k =>
      max(when(col("__slot_rn") === k + 1, valueCol)).as(s"$prefix$k")
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
