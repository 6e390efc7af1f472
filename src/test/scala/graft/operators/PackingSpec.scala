package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = (1 to 997).map(i => (i.toLong, (i * 37 % 113 + 1).toLong))
    .toDF("id", "n").repartition(7) // scrambled physical layout

  test("runningTotal equals the single-partition reference on any layout") {
    val got = Packing.runningTotal(fixture, Seq(col("id")), col("n"), "cum")
      .select($"id", $"cum").as[(Long, Long)].collect().sortBy(_._1)
    // reference: the naive global window (test-only; main code lints it)
    val want = fixture
      .withColumn("cum", sum($"n").over(Window.orderBy($"id")).cast("long"))
      .select($"id", $"cum").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("runningTotal survives an empty input") {
    val empty = fixture.filter($"id" < 0)
    assert(Packing.runningTotal(empty, Seq(col("id")), col("n"), "cum").count() == 0)
  }

  test("runningTotal's physical plan has no empty-partition window") {
    val df = Packing.runningTotal(fixture, Seq(col("id")), col("n"), "cum")
    val globals = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(globals.isEmpty, "prefix sum must not funnel into one partition")
  }

  test("packSequences over real BPE token budgets (the tx16 shape)") {
    // tx16 now budgets on Bpe.tokenCount — verify offsets are the
    // exclusive prefix sum of the SUBWORD counts, not whitespace words.
    val docs = Seq(
      (1L, "the data pipeline reads the table"),
      (2L, "tokens are counted and packed into sequences"),
      (3L, "a very small doc"),
    ).toDF("doc_id", "text")
    val withTok = docs.select($"doc_id",
      graft.functions.Bpe.tokenCount($"text").cast("long").as("n"))
    val counts = withTok.as[(Long, Long)].collect().toMap
    val packed = Packing.packSequences(withTok, Seq(col("doc_id")), col("n"), 8)
      .select($"doc_id", $"start_offset").as[(Long, Long)].collect().toMap
    var acc = 0L
    Seq(1L, 2L, 3L).foreach { id =>
      assert(packed(id) == acc)
      acc += counts(id)
    }
    val words = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split("\\s+").length.toLong }.toMap
    assert(counts != words, "BPE subword counts must differ from word counts")
  }

  test("packSequences chunks are contiguous and budget-aligned") {
    val packed = Packing.packSequences(fixture, Seq(col("id")), col("n"), 256)
      .select($"id", $"n", $"start_offset", $"chunk")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._3)
    // offsets are the exclusive prefix sum in id order
    var acc = 0L
    packed.sortBy(_._1).foreach { case (_, n, off, chunk) =>
      assert(off == acc, s"offset mismatch at acc=$acc")
      assert(chunk == off / 256)
      acc += n
    }
    // every chunk index up to the last is occupied by some doc start or
    // covered by a straddling doc (contiguous stream — no gaps)
    val total = packed.map(_._2).sum
    assert(packed.map(_._4).max <= (total - 1) / 256)
  }
}
