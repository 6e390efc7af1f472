package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join (inner and left)") {
    // one hot key (90% of rows) + a long tail
    val skewed = (1L to 2000L)
      .map(i => (if (i % 10 == 0) s"k${i % 7}" else "HOT", i))
      .toDF("key", "row_id")
    val small = Seq(("HOT", 100), ("k1", 1), ("k3", 3), ("absent", 9))
      .toDF("key", "dim_val")

    val plainInner = skewed.join(small, Seq("key"), "inner")
    val saltedInner = Skew.saltedJoin(skewed, small, "key", "row_id", 8)
    assert(saltedInner.collect().map(_.toSeq).toSet ==
      plainInner.collect().map(_.toSeq).toSet)
    assert(saltedInner.count() == plainInner.count())

    val plainLeft = skewed.join(small, Seq("key"), "left")
    val saltedLeft = Skew.saltedJoin(skewed, small, "key", "row_id", 8, "left")
    assert(saltedLeft.collect().map(_.toSeq).toSet ==
      plainLeft.collect().map(_.toSeq).toSet)
  }

  test("saltedJoin rejects join types that replication would corrupt") {
    val df = Seq(("k", 1L)).toDF("key", "row_id")
    for (bad <- Seq("right", "full", "left_semi", "left_anti")) {
      val e = intercept[IllegalArgumentException] {
        Skew.saltedJoin(df, df.select($"key", $"row_id".as("v")), "key", "row_id", 4, bad)
      }
      assert(e.getMessage.contains("inner/left"), s"joinType=$bad")
    }
  }

  test("salt is deterministic and spreads the hot key across buckets") {
    val df = (1L to 1000L).toDF("row_id")
    val a = df.select(Skew.salt(col("row_id"), 8).as("s")).as[Long].collect()
    val b = df.select(Skew.salt(col("row_id"), 8).as("s")).as[Long].collect()
    assert(a.toSeq == b.toSeq) // stable across evaluations (retry-safe)
    val counts = a.groupBy(identity).map(_._2.length)
    assert(counts.size == 8)
    assert(counts.min > 50) // roughly uniform
  }
}
