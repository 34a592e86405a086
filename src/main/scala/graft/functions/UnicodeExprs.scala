package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode hygiene kernel for corpus cleaning: NFC-normalize (composes
  * e + U+0301 into é, so visually-identical strings hash identically for
  * dedup) and strip control characters except tab and newline (CR dies
  * with the rest, so CRLF collapses to LF). One row-local pass via the
  * JDK's java.text.Normalizer — no dependency, engine-mirrorable
  * (DuckDB: nfc_normalize + a control-class regexp_replace).
  */
object UnicodeUtil {
  def clean(s: UTF8String): UTF8String = {
    val norm = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(norm.length)
    var i = 0
    while (i < norm.length) {
      val c = norm.charAt(i)
      if (!Character.isISOControl(c) || c == '\n' || c == '\t') sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** nfc_clean(text) — NFC normalization + control-char scrub. */
case class NfcClean(child: Expression) extends TextHashExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_clean"
  override def nullSafeEval(input: Any): Any =
    UnicodeUtil.clean(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeUtil.clean($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcClean =
    copy(child = newChild)
}
