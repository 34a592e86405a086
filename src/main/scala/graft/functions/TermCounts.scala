package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document term counting: lowercase, space-trim, `\s+` tokenize,
  * drop tokens shorter than `minLen`, count duplicates — one pass, one
  * output row per DISTINCT term. The declarative formulation (HOF filter +
  * explode + groupBy) interprets the lambda per element, tokenizes twice
  * (once for `size`, once for `explode`), and shuffles every token
  * occurrence; this kernel shuffles nothing and emits pre-counted terms, so
  * downstream aggregation is over distinct terms only (the map-side combine
  * done at the source, with zero row amplification).
  *
  * Tokenization matches `split(trim(lower(text)), "\\s+")` + length filter
  * exactly (space-only trim; trailing empty token kept by split then dropped
  * by the length filter when minLen >= 1).
  */
object TermCountsUtil {
  private val Ws = Pattern.compile("\\s+")

  /** Returns (n_kept_tokens, terms) where terms is insertion-ordered
    * (first occurrence) array of (term, count). */
  def termCounts(text: UTF8String, minLen: Int): InternalRow = {
    val s = text.toLowerCase.toString
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    val toks = Ws.split(s.substring(start, end), -1)
    val counts = new java.util.LinkedHashMap[String, Int]()
    var kept = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      // codePointCount matches Spark's length() (chars, not bytes) for
      // non-BMP safety; plain ASCII hits the fast path inside
      if (t.codePointCount(0, t.length) >= minLen) {
        kept += 1
        counts.merge(t, 1, (a, b) => a + b)
        ()
      }
      i += 1
    }
    val arr = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      arr(j) = new GenericInternalRow(Array[Any](UTF8String.fromString(e.getKey),
        e.getValue))
      j += 1
    }
    new GenericInternalRow(Array[Any](kept, new GenericArrayData(arr)))
  }
}

/** term_counts(text, minLen) ->
  * struct<n_tokens: int, terms: array<struct<term: string, cnt: int>>>. */
case class TermCounts(child: Expression, minLen: Int) extends TextHashExpression {
  require(minLen >= 1, s"term_counts: minLen must be >= 1, got $minLen")
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("terms", ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", IntegerType, nullable = false))), containsNull = false),
      nullable = false)))
  override def prettyName: String = "term_counts"
  override def nullSafeEval(input: Any): Any =
    TermCountsUtil.termCounts(input.asInstanceOf[UTF8String], minLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TermCountsUtil.termCounts($c, $minLen)")
  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}
