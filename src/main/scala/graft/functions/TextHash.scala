package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text-hash kernels for the dedup suite. The round-1 implementations
  * composed interpreted higher-order array functions (transform/aggregate
  * lambdas do not participate in whole-stage codegen) and paid md5+hex+conv
  * per shingle through separate expressions — ~20ms/row at sf0.1. These
  * kernels do one pass over the string with no intermediate arrays and are
  * emitted as a single static call from generated code, so the surrounding
  * plan stays inside one codegen span.
  *
  * Semantics are bit-identical to the round-1 column compositions (and to the
  * DuckDB oracles): 48-bit md5-prefix hashes, (a*h + b) mod (2^31-1)
  * permutations, space-trim + \s+ tokenization.
  */
object TextHashUtil {
  private val P = 2147483647L // 2^31 - 1
  private val Knuth = 2654435761L
  private val Ws = Pattern.compile("\\s+")

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 48 bits of md5(bytes) — equals
    * conv(substring(md5(s),1,12),16,10) in Spark/DuckDB. */
  def md5Prefix48(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) | ((h(2) & 0xffL) << 24) |
      ((h(3) & 0xffL) << 16) | ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
  }

  /** Distinct k-shingle hashes of `text` (character shingles, positions
    * 1..max(len-k+1,1) like Functions.shingles). Returns an unsorted set. */
  private def shingleHashes(text: UTF8String, k: Int): java.util.HashSet[java.lang.Long] = {
    val n = text.numChars()
    val positions = math.max(n - k + 1, 1)
    val out = new java.util.HashSet[java.lang.Long](math.min(positions * 2, 1 << 16))
    var i = 0
    while (i < positions) {
      val sh = text.substringSQL(i + 1, k)
      out.add(md5Prefix48(sh.getBytes))
      i += 1
    }
    out
  }

  /** MinHash signature from distinct shingle hashes:
    * sig[j] = min over h of (h*(2j+1) + (j*Knuth) mod P) mod P. */
  def minhash(text: UTF8String, k: Int, numHashes: Int): ArrayData =
    minhashFromSet(shingleHashes(text, k), numHashes)

  /** Same signature but over a pre-computed hash array (so LSH can reuse one
    * shingle pass for both signature and Jaccard verification). */
  def minhashFromHashes(hashes: ArrayData, numHashes: Int): ArrayData = {
    val n = hashes.numElements()
    val sig = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      val a = 2L * j + 1
      val b = (j * Knuth) % P
      var min = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (hashes.getLong(i) * a + b) % P
        if (v < min) min = v
        i += 1
      }
      sig(j) = if (n == 0) Long.MaxValue else min
      j += 1
    }
    new GenericArrayData(sig)
  }

  private def minhashFromSet(hs: java.util.HashSet[java.lang.Long], numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      val a = 2L * j + 1
      val b = (j * Knuth) % P
      var min = Long.MaxValue
      val it = hs.iterator()
      while (it.hasNext) {
        val v = (it.next().longValue() * a + b) % P
        if (v < min) min = v
      }
      sig(j) = min
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Sorted distinct shingle-hash array (the Jaccard set representation —
    * sorted so intersections are a linear merge). */
  def shingleHashSet(text: UTF8String, k: Int): ArrayData = {
    val hs = shingleHashes(text, k)
    val arr = new Array[Long](hs.size())
    val it = hs.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  /** Jaccard similarity of two sorted distinct long arrays (merge walk).
    * CONTRACT: inputs must be sorted-distinct (what shingle_hash_set /
    * ngram_hash_set emit, or wrap with array_sort(array_distinct(...)));
    * unsorted input undercounts intersections. The walk does NOT validate —
    * this runs once per candidate pair in LSH verification, and a
    * per-call validation pass re-checking the same arrays millions of
    * times measurably dominates the near-dup suite (3x at sf0.1). */
  /** Conservative early-abort threshold gate for the similarity join's
    * verify step (PPJoin-family bound): returns false ONLY when
    * `round(jaccardSorted(a,b), 6) >= t` is provably impossible. Uses
    * J >= t ⟺ |A∩B| >= t·(|A|+|B|)/(1+t) (J is monotone in the
    * intersection for fixed sizes) with 1e-6 slack for the round-to-6
    * comparison (round(j,6) >= t already implies j >= t - 5e-7), and
    * aborts the merge as soon as the remaining shorter side cannot lift
    * the intersection to the requirement — on mostly-disjoint pairs (the
    * bulk of a blocked join) that is long before the merge would finish.
    * No false negatives, so `filter(jaccard_ge) -> exact jaccard filter`
    * returns exactly the pairs the exact filter alone would. */
  def jaccardGe(a: ArrayData, b: ArrayData, t: Double): Boolean = {
    val na = a.numElements()
    val nb = b.numElements()
    val tEff = t - 1e-6
    if (tEff <= 0) return true
    val req = tEff * (na + nb).toDouble / (1.0 + tEff)
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val remaining = if (na - i < nb - j) na - i else nb - j
      if (inter + remaining < req) return false
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter >= req
  }

  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  /** Sorted distinct word n-gram hashes: tokenize like [[simhash]] (space
    * trim + \s+ split), join each n consecutive tokens with one space, hash
    * 48-bit. Token lists shorter than n contribute their single joined gram
    * (mirroring the shingle max(len-k+1,1) convention). */
  def ngramHashSet(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    val toks = Ws.split(s.substring(start, end), -1)
    val positions = math.max(toks.length - n + 1, 1)
    val hs = new java.util.HashSet[java.lang.Long](positions * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < positions) {
      sb.setLength(0)
      var j = i
      val stop = math.min(i + n, toks.length)
      while (j < stop) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      hs.add(md5Prefix48(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      i += 1
    }
    val arr = new Array[Long](hs.size())
    val it = hs.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = it.next().longValue(); idx += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  /** Winnowing fingerprints (the MOSS scheme): Rabin-Karp rolling polynomial
    * hash over k-char windows — each window hash derived from the previous
    * in O(1) — then the minimum hash of each w-window of the hash sequence
    * is selected (sliding-window minima via a monotonic deque, O(n) total).
    * Output: sorted distinct selected hashes. B=257, M=2^31-1; a text
    * shorter than k contributes its single whole-text hash. */
  def winnowFingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    val B = 257L
    val M = 2147483647L
    // highest power B^(k-1) mod M for the roll-out term
    var bk = 1L
    var p = 0
    val kk = math.min(k, math.max(n, 1))
    while (p < kk - 1) { bk = bk * B % M; p += 1 }
    val nHashes = math.max(n - k + 1, 1)
    val hashes = new Array[Long](nHashes)
    var h = 0L
    var i = 0
    val first = math.min(k, n)
    while (i < first) { h = (h * B + s.charAt(i)) % M; i += 1 }
    hashes(0) = h
    var start = 1
    while (start < nHashes) {
      val out = s.charAt(start - 1)
      val in = s.charAt(start + k - 1)
      h = ((h - out * bk % M + M) % M * B + in) % M
      hashes(start) = h
      start += 1
    }
    // sliding minima over windows of w (monotonic deque of indices);
    // fewer than w hashes = one window over all of them
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (nHashes <= w) {
      var m = hashes(0)
      var x = 1
      while (x < nHashes) { if (hashes(x) < m) m = hashes(x); x += 1 }
      selected.add(m)
    } else {
      val deque = new java.util.ArrayDeque[Int]()
      var j = 0
      while (j < nHashes) {
        while (!deque.isEmpty && hashes(deque.peekLast()) >= hashes(j)) deque.pollLast()
        deque.addLast(j)
        if (deque.peekFirst() <= j - w) { deque.pollFirst(); () }
        if (j >= w - 1) selected.add(hashes(deque.peekFirst()))
        j += 1
      }
    }
    val out = new Array[Long](selected.size())
    val it = selected.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next().longValue(); idx += 1 }
    new GenericArrayData(out)
  }

  /** SimHash: per-token 48-bit hash (duplicates counted); bit b of the result
    * is set iff the +/-1 vote sum at bit b is positive. Tokenization matches
    * split(trim(text), "\\s+"): space-only trim, trailing empty kept. */
  def simhash(text: UTF8String, bits: Int): Long = {
    val s = text.toString
    // Spark's trim strips 0x20 only (not \t\n) — String.trim would differ.
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    val trimmed = s.substring(start, end)
    val toks = Ws.split(trimmed, -1)
    val votes = new Array[Int](bits)
    var t = 0
    while (t < toks.length) {
      val h = md5Prefix48(toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Base for the string-input kernel expressions: null-safe, with codegen that
  * emits one static call (keeps the enclosing WholeStageCodegen span). */
abstract class TextHashExpression extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.catalogString}")
}

/** minhash_signature(text, k, numHashes) — fused one-pass MinHash. */
case class MinhashSignature(child: Expression, k: Int, numHashes: Int)
  extends TextHashExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def nullSafeEval(input: Any): Any =
    TextHashUtil.minhash(input.asInstanceOf[UTF8String], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.minhash($c, $k, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

/** shingle_hash_set(text, k) — sorted distinct 48-bit shingle hashes. */
case class ShingleHashSet(child: Expression, k: Int) extends TextHashExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"
  override def nullSafeEval(input: Any): Any =
    TextHashUtil.shingleHashSet(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.shingleHashSet($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

/** winnow_fingerprints(text, k, w) — Rabin-Karp rolling hash + winnowing. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int) extends TextHashExpression {
  require(k >= 1 && w >= 1, s"winnow_fingerprints: k and w must be >= 1, got k=$k w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"
  override def nullSafeEval(input: Any): Any =
    TextHashUtil.winnowFingerprints(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.winnowFingerprints($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** ngram_hash_set(text, n) — sorted distinct 48-bit word-n-gram hashes. */
case class NgramHashSet(child: Expression, n: Int) extends TextHashExpression {
  require(n >= 1, s"ngram n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hash_set"
  override def nullSafeEval(input: Any): Any =
    TextHashUtil.ngramHashSet(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.ngramHashSet($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): NgramHashSet =
    copy(child = newChild)
}

/** minhash_from_hashes(hashArray, numHashes) — signature over a precomputed
  * hash set so one shingle pass serves both LSH banding and Jaccard. */
case class MinhashFromHashes(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_from_hashes"
  override def nullSafeEval(input: Any): Any =
    TextHashUtil.minhashFromHashes(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.minhashFromHashes($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinhashFromHashes =
    copy(child = newChild)
}

/** simhash(text, bits) — fused token-vote fingerprint. */
case class SimHash(child: Expression, bits: Int) extends TextHashExpression {
  require(bits > 0 && bits <= 64, s"simhash bits must be in 1..64, got $bits")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"
  override def nullSafeEval(input: Any): Any =
    TextHashUtil.simhash(input.asInstanceOf[UTF8String], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.simhash($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** jaccard_sorted(a, b) — exact Jaccard over two sorted distinct long arrays. */
case class JaccardSorted(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashUtil.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextHashUtil.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

/** Early-abort Jaccard threshold gate (see [[TextHashUtil.jaccardGe]]):
  * true whenever `round(jaccard_sorted(a,b),6) >= t` could hold, false only
  * when provably impossible — place it BEFORE the exact jaccard filter so
  * the full merge runs only on plausible pairs. */
case class JaccardGe(left: Expression, right: Expression, threshold: Double)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "jaccard_ge"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashUtil.jaccardGe(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], threshold)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHashUtil.jaccardGe($a, $b, $threshold)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardGe =
    copy(left = newLeft, right = newRight)
}
