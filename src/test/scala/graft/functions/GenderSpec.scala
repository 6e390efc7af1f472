package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GenderSpec extends SparkSpec {
  import spark.implicits._

  test("inferirSexo looks up case-insensitively; unknown and null give null") {
    val df = Seq("MARIA", "maria", "JOSE", "ANACLETO", null).toDF("n")
      .select(Gender.inferirSexo(col("n")).as("g"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("Female"), Some("Female"), Some("Male"), None, None))
  }

  test("accented canonical names and their ASCII variants both resolve") {
    val df = Seq("MARÍA", "maría", "JOSÉ", "ANDRÉS", "ANDRES", "BELÉN", "BELEN")
      .toDF("n").select(Gender.inferirSexo(col("n")).as("g"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("Female", "Female", "Male", "Male", "Male", "Female", "Female"))
  }

  test("dictionary covers several hundred names across the full enum surface") {
    assert(Gender.dict.size > 400, s"got ${Gender.dict.size}")
    assert(Gender.dict.values.toSet ==
      Set("Male", "Female", "MostlyMale", "MostlyFemale", "Unisex"))
    // fixture unknown-name sentinels must stay out of the dictionary
    assert(!Gender.dict.contains("ANACLETO") && !Gender.dict.contains("FILOMENA"))
  }

  test("gradated names resolve to the skewed / unisex labels") {
    val df = Seq("ALEXIS", "alexis", "GUADALUPE", "CRUZ", "trinidad")
      .toDF("n").select(Gender.inferirSexo(col("n")).as("g"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("MostlyMale", "MostlyMale", "MostlyFemale", "Unisex", "Unisex"))
  }

  test("oracleCase agrees with the Spark lookup on every dict entry") {
    // The DuckDB CASE is generated from the same map; spot-check shape.
    val sql = Gender.oracleCase("nombre")
    Gender.dict.foreach { case (k, v) =>
      assert(sql.contains(s"'$k' THEN '$v'"))
    }
  }
}
