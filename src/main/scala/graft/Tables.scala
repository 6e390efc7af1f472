package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet star-schema loaders for the driver fixtures (TESTDATA.md).
  *
  * All tables are read straight from parquet so Catalyst owns column
  * pruning + filter pushdown (verify via `.explain`: `PushedFilters`,
  * `ReadSchema`). At 100 TB the same call works against a partitioned
  * lake table; nothing here assumes local files beyond the path.
  */
object Tables {
  val starTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extTables: Seq[String] = Seq("events", "documents", "embeddings")

  /** Read a fixture table, normalizing every TIMESTAMP_NTZ column to
    * plain TimestampType. The round-9 fixtures write all timestamps as
    * parquet TIMESTAMP_NTZ(µs) (isAdjustedToUTC=false), which Spark
    * surfaces as TimestampNTZType — a type several time functions
    * (`unix_micros`, `to_utc_timestamp`, …) reject. The session TZ is
    * pinned to UTC ([[Sessions]]), so the cast reinterprets the naive
    * value as the same UTC instant (micros unchanged) — exactly how the
    * DuckDB oracle reads the same column. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(raw)((df, f) => df.withColumn(f.name, col(f.name).cast(TimestampType)))
  }

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `events.ts` normalization: the engine's contract is a plain
    * TimestampType (µs, session TZ = UTC) column, whatever the fixture
    * generation wrote.
    *  - parquet TIMESTAMP(NANOS) (rounds ≤ 8): with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set in [[Sessions]])
    *    it arrives as a nanosecond long — integer-divide to µs (exact,
    *    the fixture has µs precision).
    *  - parquet TIMESTAMP_NTZ µs (round 9+): arrives as
    *    TimestampNTZType — cast to TimestampType. The session TZ is
    *    pinned to UTC, so the cast reinterprets the naive value as the
    *    same UTC instant (micros unchanged), matching how the DuckDB
    *    oracle reads the same column. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
