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
}
