package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch with md5-deterministic registers.
  *
  * Engine-builtin HLLs (Spark's `approx_count_distinct`, DuckDB's
  * `approx_count_distinct`) use engine-private hash functions and register
  * layouts, so their estimates can never be cross-checked bit-for-bit. This
  * sketch derives everything from md5 — the one hash every engine computes
  * identically — so the DuckDB oracle reproduces the registers AND the
  * estimate exactly:
  *
  *  - bucket  = first 8 bits of md5(value)        (m = 256 registers, p = 8)
  *  - w48     = next 48 bits of md5(value)
  *  - rho     = 49 - bitlength(w48)  (position of the first 1-bit, 1..48;
  *              w48 == 0 counts as 49)
  *  - register[bucket] = max(rho); empty register = 0
  *
  * The harmonic denominator sum(2^-rho) is kept EXACT by scaling to
  * integers: each register contributes `2^(49-rho)` (a long in
  * [1, 2^49]; 256 registers sum to at most 2^57, exact in a long). The
  * raw estimate alpha_256 * 256^2 / (S / 2^49) is then ONE double division
  * of that integer — no float summation whose order could differ between
  * engines. The small-range linear-counting correction (m * ln(m/V)) is
  * deliberately NOT applied inside the aggregate: ln is libm-dependent
  * (JVM vs DuckDB may differ in the last ulp), so the aggregate reports
  * the raw estimate plus the register stats (`registers_sum`, `n_zero`)
  * that let any consumer apply whichever correction it wants.
  *
  * Scale posture: the buffer is a fixed 256 bytes per (group, partition),
  * merges are element-wise max, and partial aggregation runs map-side — a
  * 100 TB distinct-count ships 256 bytes per group through the shuffle
  * instead of the values. Sketches are also storable ([[HllRegisters]]) and
  * re-mergeable ([[HllMergeEst]]): daily register blobs roll up into
  * monthly counts without touching the raw data again.
  */
object HllUtil {
  val M = 256 // registers (p = 8)
  /** alpha_256 = 0.7213/(1 + 1.079/256), the standard HLL bias constant. */
  val Alpha = 0.7182725932495458
  /** 2^49: the integer scale of one empty register's contribution. */
  val Scale: Long = 1L << 49

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** (bucket, rho) of one value: bucket = md5 byte 0; rho = first-1-bit
    * position of the 48 bits in md5 bytes 1..6 (1-based, 49 when zero). */
  def bucketRho(bytes: Array[Byte]): (Int, Int) = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    val bucket = h(0) & 0xff
    val w48 = ((h(1) & 0xffL) << 40) | ((h(2) & 0xffL) << 32) | ((h(3) & 0xffL) << 24) |
      ((h(4) & 0xffL) << 16) | ((h(5) & 0xffL) << 8) | (h(6) & 0xffL)
    val rho = if (w48 == 0L) 49 else 49 - (64 - java.lang.Long.numberOfLeadingZeros(w48))
    (bucket, rho)
  }

  def update(regs: Array[Byte], bytes: Array[Byte]): Unit = {
    val (bucket, rho) = bucketRho(bytes)
    if (rho > (regs(bucket) & 0xff)) regs(bucket) = rho.toByte
  }

  def mergeInto(into: Array[Byte], from: Array[Byte]): Unit = {
    var i = 0
    while (i < M) {
      if ((from(i) & 0xff) > (into(i) & 0xff)) into(i) = from(i)
      i += 1
    }
  }

  /** (registers_sum, n_zero): S = sum of 2^(49-rho) over all m registers. */
  def stats(regs: Array[Byte]): (Long, Int) = {
    var s = 0L
    var zeros = 0
    var i = 0
    while (i < M) {
      val rho = regs(i) & 0xff
      s += (1L << (49 - rho))
      if (rho == 0) zeros += 1
      i += 1
    }
    (s, zeros)
  }

  /** Raw HLL estimate from the integer register sum. The literal chain
    * mirrors the oracle SQL exactly (left-to-right double multiplies of
    * correctly-rounded literals, one division) so both engines produce the
    * same IEEE bits. */
  def estimate(registersSum: Long): Double =
    0.7182725932495458 * 65536.0 * 562949953421312.0 / registersSum.toDouble

  val resultSchema: StructType = StructType(Seq(
    StructField("est_hll", DoubleType, nullable = false),
    StructField("registers_sum", LongType, nullable = false),
    StructField("n_zero", IntegerType, nullable = false)))

  def evalStruct(regs: Array[Byte]): GenericInternalRow = {
    val (s, zeros) = stats(regs)
    new GenericInternalRow(Array[Any](estimate(s), s, zeros))
  }

  def requireString(dt: DataType, name: String): TypeCheckResult =
    if (dt == StringType || dt == NullType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires a string input, got ${dt.catalogString}")
}

/** `hll_distinct(col)`: the full sketch in one aggregate — returns the
  * (est_hll, registers_sum, n_zero) struct. */
case class HllDistinct(child: Expression,
                       mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = HllUtil.resultSchema
  override def prettyName: String = "hll_distinct"

  override def checkInputDataTypes(): TypeCheckResult =
    HllUtil.requireString(child.dataType, prettyName)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](HllUtil.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllUtil.update(buf, v.asInstanceOf[UTF8String].getBytes)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    HllUtil.mergeInto(buf, other); buf
  }

  override def eval(buf: Array[Byte]): Any = HllUtil.evalStruct(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(n: Int): HllDistinct = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllDistinct = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllDistinct =
    copy(child = c(0))
}

/** `hll_registers(col)`: the serialized 256-byte register blob — the
  * STORABLE form. Write these per partition/day, then roll them up with
  * [[HllMergeEst]] without re-reading the raw values. */
case class HllRegisters(child: Expression,
                        mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_registers"

  override def checkInputDataTypes(): TypeCheckResult =
    HllUtil.requireString(child.dataType, prettyName)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](HllUtil.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllUtil.update(buf, v.asInstanceOf[UTF8String].getBytes)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    HllUtil.mergeInto(buf, other); buf
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(n: Int): HllRegisters = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllRegisters = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllRegisters =
    copy(child = c(0))
}

/** `hll_merge_est(registers)`: merges stored register blobs (element-wise
  * max — HLL merge is lossless and associative) and returns the estimate
  * struct of the union. */
case class HllMergeEst(child: Expression,
                       mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = HllUtil.resultSchema
  override def prettyName: String = "hll_merge_est"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_merge_est requires a binary register blob, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](HllUtil.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val regs = v.asInstanceOf[Array[Byte]]
      require(regs.length == HllUtil.M,
        s"hll_merge_est: register blob must be ${HllUtil.M} bytes, got ${regs.length}")
      HllUtil.mergeInto(buf, regs)
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    HllUtil.mergeInto(buf, other); buf
  }

  override def eval(buf: Array[Byte]): Any = HllUtil.evalStruct(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(n: Int): HllMergeEst = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllMergeEst = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllMergeEst =
    copy(child = c(0))
}
