package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = (1 to 2000).map(i =>
    (i.toLong, Seq("en", "es", "de", "zh")(i % 4))).toDF("id", "lang")

  test("rate 1.0 keeps exactly one copy of every row") {
    val out = Sampling.stratifiedMix(fixture, "id", "lang", Map.empty, 1.0)
    assert(out.count() == 2000)
    assert(out.agg(max($"epoch"), min($"epoch")).as[(Int, Int)].head() == ((1, 1)))
  }

  test("rate 0 drops the stratum entirely; fractional rates downsample") {
    val out = Sampling.stratifiedMix(fixture, "id", "lang",
      Map("en" -> 0.0, "es" -> 0.5), 1.0)
    assert(out.filter($"lang" === "en").count() == 0)
    val es = out.filter($"lang" === "es").count().toDouble
    val esTotal = fixture.filter($"lang" === "es").count().toDouble
    assert(es / esTotal > 0.3 && es / esTotal < 0.7, s"es kept ${es / esTotal}")
  }

  test("rates above 1 materialize floor/ceil epoch copies per row") {
    val out = Sampling.stratifiedMix(fixture, "id", "lang", Map("de" -> 2.5), 0.0)
    val perRow = out.groupBy($"id").agg(count(lit(1)).as("c"), max($"epoch").as("m"))
      .select($"c".cast("long"), $"m".cast("long")).as[(Long, Long)].collect()
    assert(perRow.nonEmpty)
    assert(perRow.forall { case (c, m) => (c == 2L || c == 3L) && m == c })
    val mean = perRow.map(_._1).sum.toDouble / perRow.length
    assert(mean > 2.3 && mean < 2.7, s"mean copies $mean")
  }

  test("the decision is a pure function of the id — partitioning-invariant") {
    val a = Sampling.stratifiedMix(fixture, "id", "lang", Map("en" -> 0.5), 1.0)
      .select($"id", $"epoch").as[(Long, Int)].collect().sorted.toSeq
    val b = Sampling.stratifiedMix(fixture.repartition(13), "id", "lang",
      Map("en" -> 0.5), 1.0)
      .select($"id", $"epoch").as[(Long, Int)].collect().sorted.toSeq
    assert(a == b)
  }

  test("negative rates are rejected at plan time") {
    intercept[IllegalArgumentException] {
      Sampling.stratifiedMix(fixture, "id", "lang", Map("en" -> -0.1), 1.0)
    }
  }
}
