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
  def normalize(s: UTF8String, form: UTF8String): UTF8String =
    UTF8String.fromString(
      Normalizer.normalize(s.toString, Normalizer.Form.valueOf(form.toString)))
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen expression —
  * the canonicalization step of text dedup pipelines (equivalent byte
  * sequences must fingerprint identically). DuckDB's `nfc_normalize`
  * is the oracle counterpart for the NFC form. */
case class UnicodeNormalize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable string form), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_normalize"

  override def nullSafeEval(s: Any, form: Any): Any =
    UnicodeNormalizeUtil.normalize(
      s.asInstanceOf[UTF8String], form.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, f) =>
      s"graft.plans.UnicodeNormalizeUtil.normalize($s, $f)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): UnicodeNormalize =
    copy(left = newLeft, right = newRight)
}
