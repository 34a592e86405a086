package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused vector kernels for the similarity/dedup suite. The round-1 versions
  * composed interpreted higher-order functions (zip_with + aggregate lambdas
  * never enter whole-stage codegen) — ~1ms/pair on 64-dim vectors. These run
  * the identical IEEE operation sequence (same accumulation order, same
  * division structure), so results are bitwise equal to the HOF versions and
  * the DuckDB oracles stay green.
  */
object VectorUtil {

  @inline private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Sequential dot product with double accumulation (matches
    * aggregate(zip_with(a,b,*), 0.0, +)). NULL — like the HOF form — when
    * the lengths differ (zip_with pads with null) or any element is null
    * (a null product poisons the fold). Null checks ride inside the main
    * loop: no extra array pass. */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elem(a, i, aFloat) * elem(b, i, bFloat)
      i += 1
    }
    acc
  }

  /** NULL when any element is null (matches the aggregate fold). */
  def norm(a: ArrayData, aFloat: Boolean): java.lang.Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = elem(a, i, aFloat); acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  /** cosine = dot / (||a|| * ||b||). ONE fused pass over both arrays keeps
    * all three accumulators (dot, |a|^2, |b|^2) sequentially — each is
    * bitwise-identical to its standalone computation, and the pair costs a
    * third of the memory traffic of dot + norm + norm. */
  def cosine(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dotAcc = 0.0
    var aSq = 0.0
    var bSq = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elem(a, i, aFloat)
      val y = elem(b, i, bFloat)
      dotAcc += x * y
      aSq += x * x
      bSq += y * y
      i += 1
    }
    dotAcc / (math.sqrt(aSq) * math.sqrt(bSq))
  }
}

sealed trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // NULL on length mismatch / null elements, besides null inputs
  override def nullable: Boolean = true
  protected def isFloatElem(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"$prettyName requires array<float|double>, got ${other.catalogString}")
  }
  protected lazy val leftFloat: Boolean = isFloatElem(left)
  protected lazy val rightFloat: Boolean = isFloatElem(right)

  /** Codegen for a kernel returning a boxed Double (null = SQL NULL). */
  protected def boxedCodeGen(ctx: CodegenContext, ev: ExprCode, call: (String, String) => String): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |java.lang.Double $boxed = ${call(a, b)};
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
}

/** dot_product(a, b) — fused sequential dot with double accumulation. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.dot(a.asInstanceOf[ArrayData], leftFloat, b.asInstanceOf[ArrayData], rightFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    boxedCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorUtil.dot($a, $leftFloat, $b, $rightFloat)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** cosine_similarity(a, b) — fused, bitwise-identical to
  * dot(a,b)/(l2_norm(a)*l2_norm(b)). */
case class CosineSim(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_similarity"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.cosine(a.asInstanceOf[ArrayData], leftFloat, b.asInstanceOf[ArrayData], rightFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    boxedCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorUtil.cosine($a, $leftFloat, $b, $rightFloat)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** l2_norm(a) — fused Euclidean norm. */
case class L2Norm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_norm"
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"l2_norm requires array<float|double>, got ${other.catalogString}")
  }
  override def nullSafeEval(a: Any): Any =
    VectorUtil.norm(a.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val boxed = ctx.freshName("boxed")
      s"""
         |java.lang.Double $boxed = graft.functions.VectorUtil.norm($a, $isFloat);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

/** Fused language-ID kernel: lowercase, space-trim, \s+ tokenize, count
  * stopword hits per language, winner by (hits desc, language asc), 'und'
  * when nothing hits (matches operators.TextAnalysis.langId's HOF version). */
object LangIdUtil {
  import java.util.regex.Pattern
  private val Ws = Pattern.compile("\\s+")

  /** Canonical per-language stopword lists (TextAnalysis.stopwords aliases
    * this map, so language-ID and stopword_ratio share one table). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "en", "un", "una", "es"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "eine", "zu", "den"))

  /** language order must stay sorted (tie goes to the alphabetically first). */
  val langs: Array[String] = stopwords.keys.toArray.sorted
  private val sets: Array[java.util.HashSet[String]] =
    langs.map { l =>
      val s = new java.util.HashSet[String]()
      stopwords(l).foreach(s.add)
      s
    }
  private val interned: Array[UTF8String] = langs.map(UTF8String.fromString)
  private val und = UTF8String.fromString("und")

  def langId(text: UTF8String): UTF8String = {
    val s = text.toLowerCase.toString
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    val toks = Ws.split(s.substring(start, end), -1)
    val counts = new Array[Int](langs.length)
    var t = 0
    while (t < toks.length) {
      var l = 0
      while (l < langs.length) {
        if (sets(l).contains(toks(t))) counts(l) += 1
        l += 1
      }
      t += 1
    }
    var best = 0
    var l = 1
    while (l < counts.length) { if (counts(l) > counts(best)) best = l; l += 1 }
    if (counts(best) == 0) und else interned(best)
  }
}

/** lang_id(text) expression wrapping the fused kernel. */
case class LangId(child: Expression) extends TextHashExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override def nullSafeEval(input: Any): Any =
    LangIdUtil.langId(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdUtil.langId($c)")
  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}
