package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the 100 TB shuffle-elimination story:
  * two tables bucketed (and sorted) on the join key with equal bucket
  * counts join WITHOUT any shuffle exchange. This is the storage-layout
  * contract the engine recommends for repeated fact-fact joins. */
class BucketingSpec extends SparkSpec {

  test("equal-bucketed tables join with no shuffle exchange") {
    val db = "graft_bucket_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    Tables.orders(spark, sf0001).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable(s"$db.orders_b")
    Tables.customer(spark, sf0001).write
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable(s"$db.customer_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // disable broadcast so the bucket (sort-merge) path is exercised
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table(s"$db.orders_b")
        .join(spark.table(s"$db.customer_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      // the join itself must read bucketed scans directly — the only
      // allowed exchange is the post-join aggregation shuffle.
      val joinPart = plan.split("HashAggregate").last
      assert(joinPart.contains("SortMergeJoin") || plan.contains("SortMergeJoin"))
      val exchangesInJoin = "Exchange hashpartitioning\\(o_custkey|Exchange hashpartitioning\\(c_custkey".r
        .findAllIn(plan).length
      assert(exchangesInJoin == 0,
        s"bucketed join must not shuffle on the join key:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }

  test("op44 registered query plans the SMB join with zero exchange on the key") {
    val df = SparkEntry.queries("op44_bucketed_smb_join")(spark, sf0001)
    df.collect() // materialize so AQE finalizes the executed plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"op44 must sort-merge join (merge hint):\n$plan")
    val keyShuffles =
      "Exchange hashpartitioning\\((o_custkey|c_custkey)".r.findAllIn(plan).length
    assert(keyShuffles == 0,
      s"bucketed join must not shuffle on the join key:\n$plan")
    // single file per bucket + sortBy → the scans feed the join with no
    // per-partition Sort re-sorting the bucketed data on the join side.
    val joinSection = plan.split("SortMergeJoin").last
    assert(!joinSection.contains("Exchange"),
      s"no exchange anywhere below the join:\n$plan")
  }
}
