package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GenderSpec extends SparkSpec {
  import spark.implicits._

  test("inferirSexo looks up case-insensitively; unknown and null give null") {
    val df = Seq("MARIA", "maria", "JOSE", "WALTER", null).toDF("n")
      .select(Gender.inferirSexo(col("n")).as("g"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("Female"), Some("Female"), Some("Male"), None, None))
  }

  test("oracleCase agrees with the Spark lookup on every dict entry") {
    // The DuckDB CASE is generated from the same map; spot-check shape.
    val sql = Gender.oracleCase("nombre")
    Gender.dict.foreach { case (k, v) =>
      assert(sql.contains(s"'$k' THEN '$v'"))
    }
  }
}
