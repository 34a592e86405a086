package graft.functions

import java.math.RoundingMode
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused quality-signal kernel: one pass over the text computes every
  * column of TextAnalysis.qualitySignals. The declarative formulation
  * tokenizes three times (token count, lowercase stopword hits, length
  * fold) and pays interpreted lambda dispatch per token (HOF filter /
  * aggregate never enter whole-stage codegen); this kernel is one static
  * call inside the scan projection.
  *
  * Bit parity with the Column composition it replaces (the equivalence is
  * property-tested in TextAnalysisSpec):
  *  - tokenization = split(trim(text), "\\s+"): space-only trim, trailing
  *    empty token kept;
  *  - rounding = Spark's round(x, n) on doubles, i.e.
  *    BigDecimal.valueOf(x).setScale(n, HALF_UP);
  *  - the composite score compares the ROUNDED ratios, like the Column
  *    version (which reads back the rounded output columns).
  */
object QualityUtil {
  private val Ws = Pattern.compile("\\s+")
  private val Punct = "[.,!?;:]"
  private val enStops: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    LangIdUtil.stopwords("en").foreach(s.add)
    s
  }

  /** Spark round(x, scale) for doubles. */
  def sparkRound(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x).setScale(scale, RoundingMode.HALF_UP).doubleValue()

  private def spaceTrimBounds(s: String): (Int, Int) = {
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    (start, end)
  }

  /** (n_chars, n_tokens, punct_ratio, stopword_ratio, mean_token_len,
    * quality_score) as one struct row. */
  def signals(text: UTF8String): InternalRow = {
    val nChars = text.numChars()
    val s = text.toString
    // punct count = n_chars - length(regexp_replace(text, "[.,!?;:]", ""))
    var punct = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.' || c == ',' || c == '!' || c == '?' || c == ';' || c == ':') punct += 1
      i += 1
    }
    val (ts, te) = spaceTrimBounds(s)
    val toks = Ws.split(s.substring(ts, te), -1)
    val nToks = toks.length
    var lenSum = 0L
    var t = 0
    while (t < nToks) {
      lenSum += toks(t).codePointCount(0, toks(t).length)
      t += 1
    }
    // stopword hits tokenize lower(text) — lowercasing cannot change
    // whitespace for the \s+ class, so the token boundaries are identical
    // and lowercasing per token matches tokens(lower(text))
    val lower = text.toLowerCase.toString
    val (ls, le) = spaceTrimBounds(lower)
    val ltoks = Ws.split(lower.substring(ls, le), -1)
    var stopHits = 0
    var j = 0
    while (j < ltoks.length) {
      if (enStops.contains(ltoks(j))) stopHits += 1
      j += 1
    }
    val punctRatio = sparkRound(punct.toDouble / math.max(nChars, 1), 6)
    val stopRatio = sparkRound(stopHits.toDouble / math.max(nToks, 1), 6)
    val meanLen = sparkRound(lenSum.toDouble / math.max(nToks, 1), 6)
    val score = sparkRound(
      (if (nToks >= 10 && nToks <= 100000) 0.4 else 0.0) +
        (if (punctRatio <= 0.1) 0.3 else 0.0) +
        (if (meanLen >= 2.0 && meanLen <= 12.0) 0.3 else 0.0), 2)
    new GenericInternalRow(Array[Any](nChars, nToks, punctRatio, stopRatio, meanLen, score))
  }

  /** The regexp the Column formulation uses for the punct count — kept so
    * the spec can assert the kernel agrees with it. */
  val punctPattern: String = Punct
}

/** quality_signals(text) -> struct<n_chars:int, n_tokens:int,
  * punct_ratio:double, stopword_ratio:double, mean_token_len:double,
  * quality_score:double>. */
case class QualitySignals(child: Expression) extends TextHashExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("mean_token_len", DoubleType, nullable = false),
    StructField("quality_score", DoubleType, nullable = false)))
  override def prettyName: String = "quality_signals"
  override def nullSafeEval(input: Any): Any =
    QualityUtil.signals(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QualityUtil.signals($c)")
  override protected def withNewChildInternal(newChild: Expression): QualitySignals =
    copy(child = newChild)
}
