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

/** Fused Gopher-repetition kernel: one pass computes every column of
  * TextAnalysis.gopherRepetition. The staged-HOF formulation (kept as
  * gopherRepetitionHof, the equivalence oracle in TextAnalysisSpec) pays
  * interpreted lambda dispatch per array element; this kernel is one
  * static call inside the scan projection.
  *
  * Parity contract with the HOF composition:
  *  - tokenization = split(trim(text), "\\s+"): space-only trim, trailing
  *    empty token kept (limit -1), so nSeg >= 1 always;
  *  - the sorted-adjacency duplicate test is equality-only, so hash-map
  *    multiplicity counting gives identical counts without the sort;
  *  - segment/char lengths count CODE POINTS (Spark length semantics);
  *  - fractions are the same single IEEE division over integer sums.
  */
object GopherUtil {
  private val Ws = Pattern.compile("\\s+")

  def signals(text: UTF8String, w: Int): InternalRow = {
    val s = text.toString
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    val toks = Ws.split(s.substring(start, end), -1)
    val nTok = toks.length
    val nSeg = (nTok + w - 1) / w
    // segment multiplicity via one hash map; char sums weighted by count
    val segCounts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < nSeg) {
      val from = i * w
      val to = math.min(from + w, nTok)
      val sb = new java.lang.StringBuilder()
      var j = from
      while (j < to) {
        if (j > from) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      segCounts.merge(sb.toString, 1, Integer.sum _)
      i += 1
    }
    var nDup = 0L
    var dupChars = 0L
    var totalChars = 0L
    val it = segCounts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val seg = e.getKey
      val c = e.getValue.toLong
      val len = seg.codePointCount(0, seg.length).toLong
      totalChars += c * len
      if (c > 1) { nDup += c; dupChars += c * len }
    }
    // bigram mode via a second map (bigrams overlap, so they cannot share
    // the segment walk); the TOP gram is selected totally — max count,
    // ties to the lexicographically smallest gram — so the char fraction
    // below is engine-deterministic, not map-iteration-order luck
    var topBigram = 0L
    var topGram: String = null
    if (nTok >= 2) {
      val bgCounts = new java.util.HashMap[String, Int]()
      var k = 0
      while (k < nTok - 1) {
        bgCounts.merge(toks(k) + " " + toks(k + 1), 1, Integer.sum _)
        k += 1
      }
      val bit = bgCounts.entrySet().iterator()
      while (bit.hasNext) {
        val e = bit.next()
        val c = e.getValue.toLong
        // tie-break in UTF-8 BINARY order (Spark/DuckDB string order) —
        // java String.compareTo is UTF-16 code-unit order, which inverts
        // supplementary chars vs U+E000..U+FFFF and would break parity
        // with the HOF form's array_sort and the oracle's ORDER BY
        if (c > topBigram ||
            (c == topBigram && (topGram == null ||
              UTF8String.fromString(e.getKey)
                .compareTo(UTF8String.fromString(topGram)) < 0))) {
          topBigram = c
          topGram = e.getKey
        }
      }
    }
    val nBigrams = math.max(nTok - 1, 0).toLong
    val dupFrac = nDup.toDouble / nSeg
    val dupCharFrac = if (totalChars == 0L) 0.0 else dupChars.toDouble / totalChars
    val topFrac = if (nBigrams == 0L) 0.0 else topBigram.toDouble / nBigrams
    // Gopher's actual §A1.1 gate: characters covered by occurrences of the
    // most frequent 2-gram over the (space-trimmed) document length —
    // the quantity the paper's 0.20 threshold applies to
    val trimmedLen = s.codePointCount(start, end).toLong
    val topCharFrac =
      if (nBigrams == 0L || trimmedLen == 0L) 0.0
      else topBigram.toDouble *
        topGram.codePointCount(0, topGram.length) / trimmedLen
    new GenericInternalRow(Array[Any](
      nSeg.toLong, nDup, dupFrac, dupCharFrac, nBigrams, topBigram, topFrac,
      topCharFrac))
  }
}

/** gopher_repetition(text, w) -> struct<n_segments:bigint,
  * n_dup_segments:bigint, dup_segment_frac:double,
  * dup_segment_char_frac:double, n_bigrams:bigint, top_bigram_count:bigint,
  * top_bigram_frac:double, top_bigram_char_frac:double>. */
case class GopherRepetition(child: Expression, w: Int) extends TextHashExpression {
  require(w >= 1, s"segTokens must be >= 1, got $w")
  override def dataType: DataType = StructType(Seq(
    StructField("n_segments", LongType, nullable = false),
    StructField("n_dup_segments", LongType, nullable = false),
    StructField("dup_segment_frac", DoubleType, nullable = false),
    StructField("dup_segment_char_frac", DoubleType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_bigram_count", LongType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false),
    StructField("top_bigram_char_frac", DoubleType, nullable = false)))
  override def prettyName: String = "gopher_repetition"
  override def nullSafeEval(input: Any): Any =
    GopherUtil.signals(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GopherUtil.signals($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): GopherRepetition =
    copy(child = newChild)
}
