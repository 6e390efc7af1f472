package graft.plans

import java.text.Normalizer
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper the generated code calls (Scala objects expose static
  * forwarders, so `UnicodeNormalizeUtil.normalize(...)` is a plain
  * static call in Janino-generated Java). */
object UnicodeNormalizeUtil {
  val ValidForms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String =
    UTF8String.fromString(Normalizer.normalize(s.toString, form))
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen expression —
  * the canonicalization step of text dedup pipelines (equivalent byte
  * sequences must fingerprint identically). DuckDB's `nfc_normalize`
  * is the oracle counterpart for the NFC form.
  *
  * The form argument must be a foldable string naming a valid form —
  * validated at ANALYSIS time (an invalid form fails the query before it
  * runs, not per-row mid-job) and resolved to the `Normalizer.Form` enum
  * exactly once, not per row. */
case class UnicodeNormalize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable string form), " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
    else right.eval() match {
      case f: UTF8String if UnicodeNormalizeUtil.ValidForms.contains(f.toString) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName form must be one of " +
            s"${UnicodeNormalizeUtil.ValidForms.toSeq.sorted.mkString("/")}, got '$other'")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_normalize"

  /** Resolved once per executor instance — the form is foldable by
    * contract (checked above), so per-row `valueOf` would be waste. */
  @transient private lazy val form: Normalizer.Form =
    Normalizer.Form.valueOf(right.eval().asInstanceOf[UTF8String].toString)

  override def nullSafeEval(s: Any, formIgnored: Any): Any =
    UnicodeNormalizeUtil.normalize(s.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Embed the resolved enum constant as a referenced object so the
    // generated loop does no string→enum lookup per row.
    val formRef = ctx.addReferenceObj("graftNormForm", form, "java.text.Normalizer.Form")
    defineCodeGen(ctx, ev, (s, _) =>
      s"graft.plans.UnicodeNormalizeUtil.normalize($s, $formRef)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): UnicodeNormalize =
    copy(left = newLeft, right = newRight)
}
