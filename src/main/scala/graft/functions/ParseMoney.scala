package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's currency scrub (SURVEY F1,
  * MonarchMoneyMain-v3.py:513-532). Codegen-friendly so it stays inside
  * whole-stage codegen on the hot path (a Scala UDF would box every row and
  * break the codegen span).
  *
  * `parse_money(str) -> double`; null when unparseable, 0.0 for empty.
  */
case class ParseMoney(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType || child.dataType == org.apache.spark.sql.types.NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"parse_money requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_money"

  override def nullSafeEval(input: Any): Any =
    MoneyUtil.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val util = "graft.functions.MoneyUtil"
    val parsed = ctx.freshName("parsed")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${c.isNull}) {
        java.lang.Double $parsed = $util.parse(${c.value});
        if ($parsed != null) {
          ${ev.isNull} = false;
          ${ev.value} = $parsed.doubleValue();
        }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ParseMoney =
    copy(child = newChild)
}

/** The v3:526 scrub WITHOUT the parse: the cleaned string itself, sharing
  * [[MoneyUtil.clean]] with [[ParseMoney]] so the quarantine column is
  * byte-identical to the string the parser actually rejected. (A Spark-side
  * `trim(translate(...))` re-derivation is NOT identical: Spark's trim
  * strips only 0x20 while the kernel ends with Java `String.trim`, which
  * strips every char <= 0x20 — tabs and newlines would diverge.) */
case class MoneyClean(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType || child.dataType == org.apache.spark.sql.types.NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"money_clean requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "money_clean"

  override def nullSafeEval(input: Any): Any =
    MoneyUtil.cleaned(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MoneyUtil.cleaned($c)")

  override protected def withNewChildInternal(newChild: Expression): MoneyClean =
    copy(child = newChild)
}
