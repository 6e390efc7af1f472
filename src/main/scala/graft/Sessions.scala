package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession configuration so the driver mains (Verify/Bench)
  * and tests agree on semantics-critical settings. */
object Sessions {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // saveAsTable targets (bucketed tables) land in tmp, not the cwd
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      // The `events` fixture stores ts as parquet TIMESTAMP(NANOS), which
      // Spark cannot represent natively (TimestampType is µs). Read the
      // raw int64 and convert in Tables.events via integer division.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The round-9 fixtures write every timestamp as TIMESTAMP_NTZ(µs)
      // (isAdjustedToUTC=false). Read those as plain TimestampType AT
      // THE SCAN (session TZ is UTC, so the instant is unchanged and
      // matches the DuckDB oracle's naive read): inferring
      // TimestampNTZType instead would (a) break functions that demand
      // TIMESTAMP (unix_micros & co.) and (b) force a cast above the
      // scan that kills timestamp predicate pushdown. Tables.load keeps
      // a cast-based fallback for sessions built without this config.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
}
