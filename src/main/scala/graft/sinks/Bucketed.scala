package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed storage layout — the shuffle-ELIMINATION contract for
  * repeated fact-fact joins. Two tables hash-bucketed (and sorted) on
  * their join keys with EQUAL bucket counts join with zero exchange on
  * either side: the scan itself reports `HashPartitioning(key, n)`, so
  * the sort-merge join consumes the files as-is. At 100 TB this turns
  * the single largest cost of a recurring join pipeline — reshuffling
  * both sides every run — into a one-time layout decision at write
  * time, exactly what Hive bucketing / Iceberg bucket-partitioning /
  * Delta liquid clustering sell.
  *
  * Contrast with [[Lake.writeClustered]]: range-clustering optimizes
  * SKIPPING (each file owns a narrow key range for pruning); bucketing
  * optimizes JOINING (each file owns a hash residue class so equal
  * residues co-locate). A table can't have both layouts at once — the
  * choice is per-table, driven by whether its hot path is selective
  * scans or repeated joins.
  */
object Bucketed {

  /** Write `df` as a managed bucketed+sorted table. `repartition` on
    * the bucket key first so each bucket is ONE file — multiple files
    * per bucket are still correct but force a Sort above the scan at
    * join time (bucketed scans only elide the sort when per-bucket
    * files are individually sorted AND single). Returns the qualified
    * table name. */
  def writeTable(df: DataFrame, db: String, table: String,
                 buckets: Int, key: String): String = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = df.sparkSession
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $db.$table")
    // the session catalog is in-memory but the warehouse dir persists
    // across sessions: a leftover location from a previous run makes
    // saveAsTable refuse (LOCATION_ALREADY_EXISTS) — clear it first.
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"$db.db/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.repartition(buckets, df(key))
      .write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(s"$db.$table")
    s"$db.$table"
  }

  /** Sort-merge join of two equal-bucketed tables on their bucket
    * keys. The `merge` hint pins the SMB strategy (a small side would
    * otherwise broadcast and never exercise the layout); with equal
    * bucket counts the planner schedules bucket i ⋈ bucket i directly
    * from the files — no Exchange on either input (PlanSpec-gated). */
  def smbJoin(spark: SparkSession, leftTable: String, rightTable: String,
              leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.hint("merge").join(r, l(leftKey) === r(rightKey))
  }
}
