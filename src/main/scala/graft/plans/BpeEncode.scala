package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static tokenizer core the generated code calls. Applies
  * [[graft.functions.Bpe.merges]] per word in LEARNED RANK ORDER, each
  * exhaustively leftmost-non-overlapping — exactly the semantics of the
  * replace-chain column form ([[graft.functions.Bpe.chainEncoded]], the
  * executable spec) and of the DuckDB oracle CTEs, but as one tight JVM
  * loop per word instead of ~200 whole-string scans per document
  * (measured ~20× on tx20 at sf0.1).
  *
  * Rank-order-exhaustive equals the classic min-rank-first BPE encode:
  * a pair's merge rank is always greater than the ranks that created
  * its constituent tokens, so by the time merge k is applied no
  * lower-rank pair can reappear.
  *
  * Words repeat zipfian-style across a corpus, so encoded words are
  * memoized in a bounded per-JVM cache (concurrent, determinism
  * unaffected — the cache only skips recomputation). */
object BpeEncodeUtil {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val MaxCache = 1 << 17

  /** Merge table with ranks, materialized once per JVM. */
  private lazy val ranked: Array[(String, String)] =
    graft.functions.Bpe.merges.toArray

  private def encodeWord(w: String): String = {
    var toks = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      toks += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    var r = 0
    while (r < ranked.length && toks.length > 1) {
      val (a, b) = ranked(r)
      // exhaustive leftmost-non-overlapping merge of (a,b)
      var j = 0
      var out: scala.collection.mutable.ArrayBuffer[String] = null
      while (j < toks.length) {
        if (j + 1 < toks.length && toks(j) == a && toks(j + 1) == b) {
          if (out == null) {
            out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
            var k = 0
            while (k < j) { out += toks(k); k += 1 }
          }
          out += (a + b)
          j += 2
        } else {
          if (out != null) out += toks(j)
          j += 1
        }
      }
      if (out != null) toks = out
      r += 1
    }
    toks.mkString(" ")
  }

  private def encodedWord(w: String): String = {
    val hit = cache.get(w)
    if (hit != null) hit
    else {
      val enc = encodeWord(w)
      if (cache.size < MaxCache) cache.put(w, enc)
      enc
    }
  }

  /** Space-joined BPE encoding of a whole document (lowercase,
    * whitespace-split words — identical to the chain form's
    * `lower`/`split("\\s+")`/non-empty-filter front end). */
  def encode(s: UTF8String): UTF8String = {
    val words = s.toString.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val sb = new java.lang.StringBuilder(s.numChars() * 2)
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        if (sb.length() > 0) sb.append(' ')
        sb.append(encodedWord(words(i)))
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `graft_bpe_encode(text)` — native mini-BPE subword encoding (space-
  * joined tokens; empty string for empty/blank input). Registered by
  * [[GraftExtensions]]; [[graft.functions.Bpe]] builds tokens/counts on
  * top of it. Deterministic, null-propagating. */
case class BpeEncode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_encode"

  override def nullSafeEval(s: Any): Any =
    BpeEncodeUtil.encode(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.BpeEncodeUtil.encode($s)")

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
