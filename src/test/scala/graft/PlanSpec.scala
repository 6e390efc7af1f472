package graft

import org.apache.spark.sql.functions._
import graft.queries.{HisQueries, RelationalQueries}

/** Physical-plan quality gates — the scale contract, asserted, not
  * hoped for: column pruning and filter pushdown must reach the parquet
  * scan, dimension joins must broadcast, and the 11-way repeated dim
  * join must reuse ONE broadcast. These run against sf0.001 (plan shape
  * is scale-independent). */
class PlanSpec extends SparkSpec {

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  private def q(name: String) =
    (RelationalQueries.all ++ HisQueries.all).find(_.name == name).get
      .fn(spark, sf0001)

  test("op05 projection prunes the parquet scan to the selected columns") {
    val plan = formatted(q("op05_project_alias"))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_orderkey"))
    assert(!readSchema.contains("l_extendedprice"), "unused column must not be read")
    assert(!readSchema.contains("l_shipdate"))
  }

  test("filters push down to the parquet scan") {
    val df = Tables.lineitem(spark, sf0001)
      .filter(col("l_quantity") > 45).select("l_orderkey")
    val plan = formatted(df)
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("GreaterThan(l_quantity"), s"pushdown missing:\n$plan")
  }

  test("snowflake dim joins broadcast (no shuffle of the fact side)") {
    val plan = formatted(q("op10_snowflake_join"))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("repeated dim join: dim pipeline computed once (cached), then broadcast") {
    val df = q("op13_repeated_dim_join")
    // collect() (not a write) so THIS dataset's QueryExecution runs and
    // its adaptive plan finalizes.
    df.collect()
    val plan = formatted(df)
    assert(plan.contains("isFinalPlan=true"))
    // The dim feeding the 11 broadcasts must come from the cache — its
    // multi-stage build pipeline must not be re-planned per join (AQE
    // does not reuse broadcast stages of multi-stage subtrees; the
    // cache pins the computation to once).
    // (explain re-prints the cached subtree under every scan, so node
    // counting over the string is meaningless — the InMemoryTableScan
    // presence is the guarantee: persist computes the dim once.)
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"dim must be cached:\n${plan.take(2000)}")
  }

  test("whole-stage codegen covers the cleaning pipeline") {
    // formatted mode marks codegen'd operators with a leading '*'.
    val plan = formatted(q("op23_26_limpiar_nombres"))
    assert(plan.contains("* Project"))
  }

  test("native graft_array_dot stays inside whole-stage codegen") {
    import spark.implicits._
    // parquet-backed input (a local relation would be constant-folded).
    val df = Tables.embeddings(spark, sf0001)
      .select(graft.operators.Similarity.dot(col("embedding"), col("embedding")).as("d"))
    val plan = formatted(df)
    assert(plan.contains("* Project"), s"dot must codegen:\n$plan")
    assert(df.as[Double].head() > 0.0)
  }
}
