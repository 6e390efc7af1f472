package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registered-domain extraction — provenance
  * work in a real corpus starts from URLs, and per-source governance
  * (tx18/tx30) wants a stable per-DOMAIN key, not the raw string with
  * its case/port/fragment noise. Everything is a codegen regexp/string
  * expression chain (the tx12/Html discipline — no UDF), RE2-safe and
  * mirrored 1:1 into generated DuckDB SQL for the oracle.
  *
  * Canonical form: lowercase scheme and host, default port stripped
  * (80 for http, 443 for https — non-default ports kept), fragment
  * stripped, path and query preserved verbatim (path case is
  * server-significant; query-param reordering is corpus policy, not
  * canonicalization). Malformed rows (no `scheme://`) pass through
  * lowercased-host-less — fail-soft, the rollup buckets them under
  * their own string rather than dropping provenance.
  *
  * Registered domain: longest matching suffix from a STATIC
  * public-suffix table plus one label (the Gender-map treatment — a
  * deterministic sample of the public-suffix list compiled into a
  * literal `when` chain, swap in the full PSL per deployment). A host
  * that IS a bare suffix, or matches nothing, registers as itself. */
object Url {

  /** Deterministic sample of the public-suffix list (publicsuffix.org
    * rules are public data). MULTI-LABEL suffixes must precede their
    * single-label tails (`co.uk` before `uk`): match order is the
    * sequence order, and [[registeredDomain]] relies on it. */
  val PublicSuffixes: Seq[String] = Seq(
    "co.uk", "gov.uk", "com.ar", "com.au", "github.io",
    "com", "org", "net", "io", "ar", "uk", "de", "fr")

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostPortRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"

  /** Lowercased scheme ('' when the string has no `scheme://`). */
  def scheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  /** Lowercased host without the port ('' when malformed). */
  def host(url: Column): Column =
    lower(regexp_extract(regexp_extract(url, HostPortRe, 1), "^([^:]*)", 1))

  private def port(url: Column): Column =
    regexp_extract(regexp_extract(url, HostPortRe, 1), ":([0-9]+)$", 1)

  /** Path + query with the fragment stripped (may be ''). */
  private def rest(url: Column): Column =
    regexp_replace(
      regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""),
      "#.*$", "")

  /** Canonical URL (see object doc). Malformed input → lowercased
    * whole string (still a stable rollup key). */
  def canonicalize(url: Column): Column = {
    val s = scheme(url)
    val p = port(url)
    val keepPort = p =!= "" &&
      !((s === "http" && p === "80") || (s === "https" && p === "443"))
    when(s === "", lower(url))
      .otherwise(concat(s, lit("://"), host(url),
        when(keepPort, concat(lit(":"), p)).otherwise(lit("")),
        rest(url)))
  }

  /** Registered domain of a lowercase host: first (longest-first)
    * suffix match wins, result = one label + the suffix. */
  def registeredDomain(hostCol: Column): Column = {
    val matched = PublicSuffixes.foldLeft(lit(null).cast("string")) { (acc, sfx) =>
      val esc = sfx.replace(".", "\\.")
      coalesce(acc,
        when(hostCol.rlike(s"\\.$esc$$"),
          concat(regexp_extract(hostCol, s"([^.]+)\\.$esc$$", 1), lit("." + sfx))))
    }
    coalesce(matched, hostCol)
  }

  // ------------------------------------------------------------------
  // Oracle mirrors (generated DuckDB SQL over a column expression)

  def schemeSql(e: String): String =
    s"lower(coalesce(regexp_extract($e, '$SchemeRe', 1), ''))"

  def hostSql(e: String): String =
    s"lower(regexp_extract(coalesce(regexp_extract($e, '$HostPortRe', 1), ''), '^([^:]*)', 1))"

  private def portSql(e: String): String =
    s"coalesce(regexp_extract(coalesce(regexp_extract($e, '$HostPortRe', 1), ''), ':([0-9]+)$$', 1), '')"

  private def restSql(e: String): String =
    s"regexp_replace(regexp_replace($e, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''), '#.*$$', '')"

  def canonicalizeSql(e: String): String = {
    val s = schemeSql(e); val p = portSql(e)
    s"""CASE WHEN $s = '' THEN lower($e)
        ELSE $s || '://' || ${hostSql(e)} ||
          (CASE WHEN $p <> '' AND NOT (($s = 'http' AND $p = '80') OR
                                       ($s = 'https' AND $p = '443'))
                THEN ':' || $p ELSE '' END) || ${restSql(e)} END"""
  }

  def registeredDomainSql(hostE: String): String = {
    val whens = PublicSuffixes.map { sfx =>
      val esc = sfx.replace(".", "\\.")
      s"WHEN regexp_matches($hostE, '\\.$esc$$') THEN " +
        s"regexp_extract($hostE, '([^.]+)\\.$esc$$', 1) || '.$sfx'"
    }.mkString("\n      ")
    s"(CASE $whens ELSE $hostE END)"
  }
}
