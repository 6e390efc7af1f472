package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping for a parquet lake table — the min/max
  * stats manifest that lakehouse formats (Delta/Iceberg/Hudi) keep per
  * file, implemented on plain parquet: one manifest row per data file
  * with the min/max of chosen columns, written under a `_`-prefixed
  * subdirectory (invisible to `spark.read.parquet` — same convention as
  * `_SUCCESS`). A predicate-bounded read then prunes files BEFORE the
  * scan plan is even built, so a 100 TB table with a tight clustering
  * layout answers a selective query by reading a handful of files.
  *
  * Row-group stats inside parquet footers already serve the same role
  * WITHIN a file; the manifest works ACROSS files, where the planner
  * otherwise has to list and open every footer. Skipping is
  * conservative: a file survives if its [min,max] interval intersects
  * the queried range, and the caller re-applies the exact predicate —
  * results are identical to a full scan by construction (the oracle
  * row checks exactly that).
  *
  * Skipping is only as good as the layout: [[writeClustered]] range-
  * partitions + sorts so each file owns a narrow range of the cluster
  * key; [[zorderValue]] interleaves two keys' bits so BOTH dimensions
  * stay narrow per file (the multi-dimensional clustering the Z-order
  * literature and Delta's OPTIMIZE ZORDER BY implement).
  */
object Lake {

  val StatsDir = "_stats_manifest"

  /** Range-cluster `df` by `clusterCols` into `numFiles` files and
    * write parquet + stats manifest for `statsCols`. Each output file
    * covers a contiguous range of the cluster key (range repartition
    * picks boundaries by sampling; sortWithinPartitions keeps parquet
    * row groups tight). `numFiles` is EXPLICIT — AQE would otherwise
    * coalesce a small shuffle into one file and no layout survives;
    * size it as table_bytes / target_file_bytes (128–512 MB files at
    * 100 TB). */
  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[Column],
                     statsCols: Seq[String], numFiles: Int = 16): Unit = {
    df.repartitionByRange(numFiles, clusterCols: _*)
      .sortWithinPartitions(clusterCols: _*)
      .write.mode("overwrite").parquet(path)
    writeStats(df.sparkSession, path, statsCols)
  }

  /** (Re)build the stats manifest: one distributed pass grouped by
    * `input_file_name()` — no driver-side data. The manifest itself is
    * file-count-sized (tiny), coalesced to one file. */
  def writeStats(spark: SparkSession, path: String, statsCols: Seq[String]): Unit = {
    val data = spark.read.parquet(path)
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    data.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$StatsDir")
  }

  /** Read only the files whose [min,max] can intersect [lo, hi] on
    * `column`. The manifest collect is O(files) driver work — the same
    * bounded class as Packing's partition offsets; at 100 TB the file
    * list is millions at most, and only (path, min, max) triples move.
    * The result is a conservative SUPERSET of the matching rows: the
    * caller applies the exact predicate on top (Catalyst additionally
    * pushes it into the surviving files' row-group stats). */
  def readPruned(spark: SparkSession, path: String, column: String,
                 lo: Long, hi: Long): DataFrame = {
    val stats = spark.read.parquet(s"$path/$StatsDir")
    val files = stats
      .filter(col(s"max_$column") >= lo && col(s"min_$column") <= hi)
      .select(col("file")).collect().map(_.getString(0))
    if (files.isEmpty) spark.read.parquet(path).limit(0)
    else spark.read.parquet(files.toSeq: _*)
  }

  /** Files the manifest would read for [lo, hi] vs total — the skipping
    * ratio, for specs and ops visibility. */
  def pruneStats(spark: SparkSession, path: String, column: String,
                 lo: Long, hi: Long): (Long, Long) = {
    val stats = spark.read.parquet(s"$path/$StatsDir")
    val kept = stats.filter(col(s"max_$column") >= lo && col(s"min_$column") <= hi).count()
    (kept, stats.count())
  }

  /** Z-order (Morton) value of two non-negative integer columns: the
    * low `bits` bits of each, interleaved (x in even positions, y in
    * odd). Pure arithmetic inside codegen — shifts, masks, adds — and
    * reproducible in any engine, which keeps layouts oracle-checkable.
    * Clustering by this value keeps BOTH x and y ranges narrow in every
    * file, so single-column predicates on either dimension skip files;
    * bits beyond `bits` are ignored (clustering quality degrades
    * gracefully, correctness is the caller's re-applied predicate). */
  def zorderValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftright(x.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
}
