package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dictionary-based gender inference — the reference's one custom scalar
  * function `inferirSexo` (reference: src/Command/EtlHisTurnosCommand.php:
  * 359-375; SURVEY OP-29), which wraps a static given-name→gender
  * dictionary with failure→null semantics.
  *
  * Implemented NOT as a Scala UDF but as a map-literal lookup
  * (`element_at` over a `typedLit(Map)`), which stays inside whole-stage
  * codegen and broadcasts the dictionary with the plan — the idiomatic
  * Spark equivalent of the reference's in-process dictionary. Missing
  * names yield null, matching the reference's catch→null behavior.
  *
  * The dictionary itself is a small public-knowledge sample of Spanish
  * given names (the reference uses a public name-dictionary library);
  * swap in a larger broadcast map for production use — the lookup shape
  * is identical at any dictionary size that fits an executor.
  */
object Gender {
  /** name (uppercase) → gender label, mirroring the reference library's
    * enum names (Male/Female). */
  val dict: Map[String, String] = Map(
    "MARIA"  -> "Female", "JOSE"  -> "Male",   "JUAN"   -> "Male",
    "ANA"    -> "Female", "CARLOS"-> "Male",   "LUCIA"  -> "Female",
    "PEDRO"  -> "Male",   "CARMEN"-> "Female", "DIEGO"  -> "Male",
    "ROSA"   -> "Female", "LUIS"  -> "Male",   "SOFIA"  -> "Female",
  )

  private val dictCol = typedLit(dict)

  /** Infer gender from a first-name column; null when unknown or null. */
  def inferirSexo(firstName: Column): Column =
    element_at(dictCol, upper(firstName))

  /** DuckDB-runnable CASE expression equivalent, for oracle SQL. */
  def oracleCase(expr: String): String = {
    val whens = dict.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN upper($expr) = '$k' THEN '$v'" }
      .mkString(" ")
    s"(CASE $whens ELSE NULL END)"
  }
}
