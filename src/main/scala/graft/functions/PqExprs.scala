package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encoding kernel (the memory-compression leg of ANN:
  * a 64-dim float vector becomes m small codes, ~32x smaller, and distance
  * evaluation against a query becomes m table lookups — the layout that
  * keeps a 100 TB embedding corpus scannable).
  *
  * All distance math is over QUANTIZED components — `floor(v * 2^10)` as a
  * long — so code assignment is integer arithmetic: order-invariant,
  * engine-exact, oracle-checkable bit-for-bit (double accumulation would tie
  * argmin results to summation order). The power-of-two scale is exact (no
  * multiply rounding) and floor has no tie mode.
  */
object PqUtil {
  /** Quantization scale 2^10 — exact in doubles, coarse enough that squared
    * diffs over 16-dim subvectors stay far from long overflow. */
  val Quant: Double = 1024.0

  def quantize(v: Double): Long = math.floor(v * Quant).toLong

  /** Per-subspace argmin code assignment. `codebook(s*ksub + c)` holds the
    * quantized centroid for code `c` of subspace `s`; ties take the lowest
    * code (strict `<` keeps the earlier candidate). NULL elements poison the
    * whole result (callers treat the row as unencodable). */
  def encode(vec: ArrayData, isFloat: Boolean, codebook: Array[Array[Long]],
             m: Int, ksub: Int): ArrayData = {
    val subDim = codebook(0).length
    if (vec.numElements() < m * subDim) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < ksub) {
        val cb = codebook(s * ksub + c)
        var d = 0L
        var i = 0
        while (i < subDim) {
          val idx = s * subDim + i
          if (vec.isNullAt(idx)) return null
          val v = if (isFloat) vec.getFloat(idx).toDouble else vec.getDouble(idx)
          val diff = quantize(v) - cb(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }
}

/** pq_encode(vec) — PQ codes for a vector against a fixed codebook. */
case class PqEncode(child: Expression, codebook: Seq[Seq[Long]], m: Int, ksub: Int)
  extends UnaryExpression {
  require(codebook.size == m * ksub,
    s"pq_encode: codebook must have m*ksub = ${m * ksub} rows, got ${codebook.size}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"pq_encode requires array<float|double>, got ${other.catalogString}")
  }
  @transient private lazy val cbArray: Array[Array[Long]] =
    codebook.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    PqUtil.encode(input.asInstanceOf[ArrayData], isFloat, cbArray, m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArray, "long[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("pqCodes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.PqUtil.encode($c, $isFloat, $cbRef, $m, $ksub);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $out; }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}
