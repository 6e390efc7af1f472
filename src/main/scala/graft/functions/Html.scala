package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the operator in FRONT of every real corpus
  * build: the crawl landing format is HTML, and everything downstream
  * (tx11 boilerplate removal, quality gates, dedup) consumes plain
  * text blocks. A chain of codegen'd global `regexp_replace`s plus
  * plain `replace`s (no UDF, no parser allocation per row — linear
  * scans the tx12 PII-scrub discipline), so the pass stays inside
  * whole-stage codegen over a 100 TB scan. Patterns are
  * RE2-compatible (no backreferences, no lookaround), so DuckDB
  * applies the identical rule in the oracle.
  *
  * Extraction order (each step creates the preconditions of the next):
  *  1. drop `<script>`/`<style>` ELEMENTS whole — their text content
  *     is code, and it may contain literal `"<p>"` strings that must
  *     never segment or survive as text;
  *  2. drop CDATA sections then comments whole — both may contain
  *     markup; a comment ends at the FIRST `-->` (the HTML spec's
  *     rule: "nested" comments are not a thing, the tail leaks as
  *     text — HtmlSpec pins exactly that);
  *  3. turn BLOCK-level boundaries (both tags of p/h1..h6/div/li/
  *     title/tr/pre/blockquote plus void br/hr) into newlines — block
  *     segmentation (NOTE: `<pre>` segments as a block but its inner
  *     whitespace still collapses — preserving pre-formatting is out
  *     of contract for a text-corpus extractor);
  *  4. strip every remaining tag. The tag pattern skips over QUOTED
  *     attribute values, so `<h1 data-x="a>b">` is one tag — the
  *     naive `<[^>]*>` truncates at the `>` inside the attribute and
  *     leaks `b">` into the text (HtmlSpec pins this);
  *  5. decode entities, `&amp;` LAST so `&amp;lt;` decodes to the
  *     literal text `&lt;` (correct HTML semantics), never to `<`.
  *
  * Splitting the result on newlines and dropping empty/whitespace
  * blocks yields the block list ([[extractBlocks]]).
  */
object Html {

  /** Tag token that tolerates `>` inside quoted attribute values:
    * unquoted runs and quoted strings alternate until the real
    * closing `>`. */
  private[graft] val TagRe =
    """<[/!]?[A-Za-z][^>"']*(?:("[^"]*"|'[^']*')[^>"']*)*>"""

  private[graft] val ScriptRe = """(?is)<script\b[^>]*>.*?</script\s*>"""
  private[graft] val StyleRe = """(?is)<style\b[^>]*>.*?</style\s*>"""
  private[graft] val CommentRe = """(?s)<!--.*?-->"""

  /** `<![CDATA[ … ]]>` dropped whole (round-17 verdict item 8): in the
    * HTML syntax a CDATA section outside foreign content is a bogus
    * comment, and its body may contain fake markup — without this rule
    * the `<![` prefix matches no tag pattern ([[TagRe]] requires a
    * letter) and the whole section would LEAK into the text. Non-greedy
    * to the first `]]>`, mirroring [[CommentRe]]'s first-`-->` rule. */
  private[graft] val CdataRe = """(?s)<!\[CDATA\[.*?\]\]>"""

  /** Block boundary: opening OR closing forms of the block-level tags
    * (attributes tolerated), plus the void br/hr. Attribute values are
    * skipped the same way [[TagRe]] does — a block tag with a quoted
    * '>' in an attribute must segment at the REAL tag end, not leak
    * the attribute tail into the text. */
  private[graft] val BlockTagRe =
    """(?i)</?(p|h[1-6]|div|li|ul|ol|title|tr|table|pre|blockquote|br|hr)\b[^>"']*(?:("[^"]*"|'[^']*')[^>"']*)*>"""

  /** Entity decode table, in APPLICATION ORDER — `&amp;` last. ONE
    * definition feeds the Spark chain and the generated oracle SQL. */
  private[graft] val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&#47;" -> "/", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Segmented plain text: blocks separated by `\n`, tags stripped,
    * entities decoded, intra-block whitespace collapsed. */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(html, ScriptRe, "")
    val noStyle = regexp_replace(noScript, StyleRe, "")
    val noCdata = regexp_replace(noStyle, CdataRe, "")
    val noComment = regexp_replace(noCdata, CommentRe, "")
    val segmented = regexp_replace(noComment, BlockTagRe, "\n")
    val noTags = regexp_replace(segmented, TagRe, "")
    // entity tokens contain no regex metacharacters and the
    // replacements no '$'/'\', so plain regexp_replace is literal-safe
    val decoded = Entities.foldLeft(noTags) { case (c, (e, ch)) =>
      regexp_replace(c, e, ch)
    }
    // collapse horizontal whitespace within blocks, keep the \n
    // separators; trim each block at split time (extractBlocks)
    regexp_replace(decoded, "[ \\t\\r]+", " ")
  }

  /** Non-empty trimmed blocks, in document order. */
  def extractBlocks(html: Column): Column =
    filter(transform(split(extractText(html), "\n"), b => trim(b)),
      b => b =!= "")

  /** The identical extraction as DuckDB SQL over `expr` (the oracle
    * mirror — generated from the same pattern constants). DuckDB
    * regexp_replace needs the 'g' flag for global; replace() is
    * global already. */
  def extractTextSql(expr: String): String = {
    // DuckDB '…' literals are not backslash-escaped — pass regex
    // backslashes through verbatim, double only the quotes
    def esc(s: String): String = s.replace("'", "''")
    val noScript = s"regexp_replace($expr, '${esc(ScriptRe)}', '', 'g')"
    val noStyle = s"regexp_replace($noScript, '${esc(StyleRe)}', '', 'g')"
    val noCdata = s"regexp_replace($noStyle, '${esc(CdataRe)}', '', 'g')"
    val noComment = s"regexp_replace($noCdata, '${esc(CommentRe)}', '', 'g')"
    val segmented = s"regexp_replace($noComment, '${esc(BlockTagRe)}', chr(10), 'g')"
    val noTags = s"regexp_replace($segmented, '${esc(TagRe)}', '', 'g')"
    val decoded = Entities.foldLeft(noTags) { case (c, (e, ch)) =>
      s"replace($c, '${esc(e)}', '${esc(ch)}')"
    }
    s"regexp_replace($decoded, '[ \\t\\r]+', ' ', 'g')"
  }
}
