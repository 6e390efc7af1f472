package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val d0 = java.sql.Date.valueOf("2024-01-01")
  private val d1 = java.sql.Date.valueOf("2024-06-01")
  private val dOld = java.sql.Date.valueOf("2023-01-01")

  // key 1: will change; key 2: no-op update; key 3: no update at all;
  // key 4: closed history row only (plus its open successor).
  private def current = Seq(
    (1L, "a", Option(10.0), Option(d0), Option.empty[java.sql.Date], true),
    (2L, "b", Option(20.0), Option(d0), Option.empty[java.sql.Date], true),
    (3L, "c", Option(30.0), Option(d0), Option.empty[java.sql.Date], true),
    (4L, "old", Option(1.0), Option(dOld), Option(d0), false),
    (4L, "d", Option(40.0), Option(d0), Option.empty[java.sql.Date], true),
  ).toDF("k", "v", "bal", "valid_from", "valid_to", "is_current")

  test("scd2 merge: change closes the old row and opens a new one; no-op passes through") {
    val updates = Seq(
      (1L, "a2", Option(11.0)),   // changed
      (2L, "b", Option(20.0)),    // identical → must NOT version
      (5L, "new", Option(50.0)),  // brand-new key
    ).toDF("k", "v", "bal")
    val out = Scd2.merge(current, updates, "k", Seq("v", "bal"), d1)
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .as[(Long, String, java.sql.Date, Option[java.sql.Date], Boolean)]
      .collect().toSet

    assert(out == Set(
      (1L, "a", d0, Some(d1), false),      // closed
      (1L, "a2", d1, None, true),          // new version
      (2L, "b", d0, None, true),           // no-op untouched
      (3L, "c", d0, None, true),           // absent from updates untouched
      (4L, "old", dOld, Some(d0), false),  // closed history passthrough
      (4L, "d", d0, None, true),
      (5L, "new", d1, None, true),         // insert
    ))
  }

  test("scd2 merge: null→value and value→null both count as changes (null-safe compare)") {
    val cur = Seq(
      (1L, Option.empty[Double], Option(d0), Option.empty[java.sql.Date], true),
      (2L, Option(2.0), Option(d0), Option.empty[java.sql.Date], true),
    ).toDF("k", "bal", "valid_from", "valid_to", "is_current")
    val updates = Seq((1L, Option(9.0)), (2L, Option.empty[Double])).toDF("k", "bal")
    val out = Scd2.merge(cur, updates, "k", Seq("bal"), d1)
    assert(out.filter(col("is_current") && !col("valid_from") .eqNullSafe(lit(d1))).count() == 0)
    assert(out.filter(col("is_current")).count() == 2)
    assert(out.filter(!col("is_current")).count() == 2)
  }

  test("pointInTime joins each fact to the version valid at its timestamp") {
    val hist = Seq(
      (1L, "v1", Option(d0), Option(d1), false),
      (1L, "v2", Option(d1), Option.empty[java.sql.Date], true),
    ).toDF("k", "tag", "valid_from", "valid_to", "is_current")
    val facts = Seq(
      (10L, 1L, java.sql.Date.valueOf("2024-03-01")), // inside v1
      (11L, 1L, java.sql.Date.valueOf("2024-06-01")), // boundary: half-open → v2
      (12L, 1L, java.sql.Date.valueOf("2025-01-01")), // open row v2
      (13L, 1L, java.sql.Date.valueOf("2023-01-01")), // before any version → null
      (14L, 2L, java.sql.Date.valueOf("2024-03-01")), // unknown key → null
    ).toDF("fact_id", "fk", "ts")
    val out = Scd2.pointInTime(facts, hist, "fk", "k", "ts")
      .select("fact_id", "tag").as[(Long, Option[String])].collect().toMap
    assert(out == Map(10L -> Some("v1"), 11L -> Some("v2"), 12L -> Some("v2"),
      13L -> None, 14L -> None))
  }

  test("scd2 merge drops null-key update rows instead of emitting all-null history") {
    val updates = Seq(
      (Option(1L), "a2", Option(11.0)),
      (Option.empty[Long], "junk", Option(99.0)),
    ).toDF("k", "v", "bal")
    val out = Scd2.merge(current, updates, "k", Seq("v", "bal"), d1)
    assert(out.filter(col("k").isNull).count() == 0, "no fabricated null-key rows")
    assert(out.filter(col("v") === "junk").count() == 0)
    assert(out.filter(col("v") === "a2" && col("is_current")).count() == 1)
  }

  test("pointInTime works when facts and history share lineage (self-join safety)") {
    val base = Seq((1L, "x")).toDF("k", "tag")
    val hist = base
      .withColumn("valid_from", lit(d0))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
    val facts = base.select(col("k"), lit(java.sql.Date.valueOf("2024-03-01")).as("ts"))
    val out = Scd2.pointInTime(facts, hist, "k", "k", "ts").collect()
    assert(out.length == 1)
  }

  test("scd2 merge is idempotent: replaying the same update batch is a no-op") {
    val updates = Seq((1L, "a2", Option(11.0))).toDF("k", "v", "bal")
    val once = Scd2.merge(current, updates, "k", Seq("v", "bal"), d1)
    val twice = Scd2.merge(once, updates, "k", Seq("v", "bal"), d1)
    assert(once.collect().toSet == twice.collect().toSet)
  }
}
