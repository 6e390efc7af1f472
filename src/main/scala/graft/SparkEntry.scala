package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query inventory lives in graft.queries.*; each entry pairs a Spark
  * DataFrame program with a DuckDB oracle over the same parquet tables. */
object SparkEntry {

  private val registered: Seq[Q] =
    RelationalQueries.all ++ HisQueries.all ++ EventQueries.all ++
      TextQueries.all ++ VectorQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's full wide extraction (6-table join tree + slot pivot). */
  def entry(spark: SparkSession): DataFrame =
    his.TurnosPipeline.wideExtract(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.toQueries(registered)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.toOracles(registered)
}
