package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen `count(xᵢ ≤ v)` over a numeric array — the empirical-
  * CDF probe against a [[graft.operators.QuantileBottomK]] sample:
  * rank(v) = graft_array_count_leq(sample, v) / size(sample). The
  * sketch array rides a broadcast join onto every fact row, so the
  * probe IS the hot loop (k comparisons per row); a `size(filter(...))`
  * higher-order formulation would interpret a lambda per element —
  * the same reason [[ArrayDot]] exists. Comparison is IEEE `<=` on
  * doubles, identical in any engine.
  *
  * Null semantics match the strict HOF chain it replaces: null array or
  * null probe value → null; any null element → null.
  */
case class ArrayCountLeq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (arrOk && right.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, double) arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_array_count_leq"

  // Null elements make the result null even for non-nullable inputs —
  // same Janino-safety rationale as ArrayDot.nullable.
  override def nullable: Boolean = true

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val v = b.asInstanceOf[Double]
    val n = xs.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      val x = if (isFloat) xs.getFloat(i).toDouble else xs.getDouble(i)
      if (x <= v) c += 1L
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val bad = ctx.freshName("bad")
      val getA = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |boolean $bad = false;
         |long $c = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; break; }
         |  if (($getA) <= $b) { $c += 1L; }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $c; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayCountLeq =
    copy(left = newLeft, right = newRight)
}
