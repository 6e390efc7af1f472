package graft.operators

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val snapshot = Seq(
    (1L, "a"), (2L, "b"), (3L, "c"),
  ).toDF("k", "v")

  test("cdc apply: last op per key wins by sequence; deletes remove; inserts add") {
    val changes = Seq(
      (1L, "a9", "U", 5L),  // update
      (2L, "zz", "U", 1L),  // update then...
      (2L, "zz", "D", 2L),  // ...delete — D wins by seq
      (3L, "c3", "D", 1L),  // delete then...
      (3L, "c3", "U", 2L),  // ...re-upsert — U wins by seq
      (4L, "d", "I", 1L),   // insert new key
      (9L, "x", "D", 1L),   // delete of an absent key: no-op
    ).toDF("k", "v", "op", "seq")
    val out = Cdc.apply(snapshot, changes, "k", "seq")
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a9"), (3L, "c3"), (4L, "d")))
  }

  test("cdc apply is idempotent for a replayed batch") {
    val changes = Seq((1L, "a9", "U", 5L), (2L, "b", "D", 1L)).toDF("k", "v", "op", "seq")
    val once = Cdc.apply(snapshot, changes, "k", "seq")
    val twice = Cdc.apply(once, changes, "k", "seq")
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("cdc apply fails loudly on malformed op values instead of dropping rows") {
    // A null or unknown op used to be silently filtered by `op != 'D'`
    // (null predicate), i.e. treated as a delete for that key.
    for (badOp <- Seq(null.asInstanceOf[String], "X")) {
      val changes = Seq((1L, "a9", badOp, 5L), (4L, "d", "I", 1L))
        .toDF("k", "v", "op", "seq")
      val e = intercept[Exception] {
        Cdc.apply(snapshot, changes, "k", "seq").collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("malformed CDC op")),
        s"op=$badOp must raise the malformed-op error, got: $e")
    }
  }
}
