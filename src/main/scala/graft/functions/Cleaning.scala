package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String-normalization kit reproducing the reference's `limpiarNombres`
  * semantics (reference: src/Command/EtlHisTurnosCommand.php:339-349) as
  * pure Catalyst column expressions — whole-stage-codegen friendly, no UDFs.
  *
  * Null propagation is native: every built-in here returns null on null
  * input, which matches the reference's explicit null guard
  * (EtlHisTurnosCommand.php:341-343, SURVEY OP-08).
  */
object Cleaning {

  /** Collapse whitespace runs → trim → Unicode uppercase.
    * Reference: EtlHisTurnosCommand.php:345-348 (SURVEY OP-23/24/25/26).
    * Spark's `upper` is Unicode-aware (ñ→Ñ, á→Á) like PHP mb_strtoupper.
    *
    * Order matters: SQL `trim` strips only ASCII spaces, while PHP's
    * trim strips tabs/newlines too — collapsing `\s+` to a single space
    * FIRST turns any edge whitespace into plain spaces that trim then
    * removes (found by PropertySpec: trim-first left a leading space
    * for tab-prefixed input). */
  def limpiarNombres(c: Column): Column =
    upper(trim(regexp_replace(c, "\\s+", " ")))

  /** First space-delimited token — the reference's given-name extraction
    * for gender inference (EtlHisTurnosCommand.php:137, SURVEY OP-27). */
  def firstToken(c: Column): Column = element_at(split(c, " "), 1)

  /** Unicode normalization (codegen [[graft.plans.UnicodeNormalize]],
    * registered by GraftExtensions): canonicalize equivalent byte
    * sequences before fingerprinting/dedup. `form` ∈ NFC/NFD/NFKC/NFKD. */
  def normalizeUnicode(c: Column, form: String): Column =
    call_function("graft_unicode_normalize", c, lit(form))

  /** Accent stripping: NFD-decompose, drop combining marks — "café" →
    * "cafe". Mirror of DuckDB's `strip_accents` for Latin text. */
  def stripAccents(c: Column): Column =
    regexp_replace(normalizeUnicode(c, "NFD"), "\\p{Mn}", "")

  /** Non-empty predicate gating unpivoted values
    * (EtlHisTurnosCommand.php:175, SURVEY OP-07). Deliberate divergence
    * recorded in SURVEY §7.4: PHP `empty("0")` is true; we treat "0" as a
    * valid value. */
  def nonEmpty(c: Column): Column = c.isNotNull && trim(c) =!= ""
}
