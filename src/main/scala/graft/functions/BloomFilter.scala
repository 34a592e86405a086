package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic Bloom filter for broadcast semi-join reduction — the
  * classic 100 TB join optimization: build a compact bitset over the build
  * side's join keys, broadcast it (a few MB for millions of keys), and
  * pre-filter the probe side BEFORE its shuffle. False positives survive to
  * the exact join and die there; false negatives are impossible, so the
  * join result is identical — only the probe-side shuffle volume changes,
  * by the build side's key selectivity.
  *
  * All hashing is md5-derived (two independent 64-bit halves driving
  * standard double hashing g_i = h1 + i*h2 mod m), so the filter content is
  * exactly reproducible on any engine — unlike
  * `spark.sql.optimizer.runtime.bloomFilter` (whose xxhash layout is
  * engine-private, and which only triggers on shuffle-join shapes the
  * optimizer recognizes). This one is an explicit operator the pipeline
  * author places.
  */
object BloomUtil {

  /** Two independent 64-bit hashes from one md5 pass (first/second 8 bytes,
    * big-endian). */
  def hashPair(bytes: Array[Byte]): (Long, Long) = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < 8) {
      h1 = (h1 << 8) | (d(i) & 0xffL)
      h2 = (h2 << 8) | (d(i + 8) & 0xffL)
      i += 1
    }
    (h1, h2)
  }

  /** Floor-mod position of probe `i` in an m-bit filter. */
  @inline private def pos(h1: Long, h2: Long, i: Int, numBits: Int): Int = {
    val g = (h1 + i.toLong * h2) % numBits
    (if (g < 0) g + numBits else g).toInt
  }

  def set(words: Array[Long], v: UTF8String, numBits: Int, numHashes: Int): Unit = {
    val (h1, h2) = hashPair(v.getBytes)
    var i = 0
    while (i < numHashes) {
      val p = pos(h1, h2, i, numBits)
      words(p >> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  /** Membership probe — the per-fact-row hot path (one md5 + k bit tests,
    * short-circuiting on the first clear bit). */
  def contains(words: ArrayData, v: UTF8String, numBits: Int, numHashes: Int): Boolean = {
    val (h1, h2) = hashPair(v.getBytes)
    var i = 0
    while (i < numHashes) {
      val p = pos(h1, h2, i, numBits)
      if ((words.getLong(p >> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** `bloom_agg(key, numBits, numHashes)` — aggregate the build side's keys
  * into an m-bit Bloom bitset (array<bigint> of m/64 words). Merges are a
  * word-wise OR, so partial aggregation works map-side: each (group,
  * partition) ships m/64 longs, never the keys. NULL keys are skipped (a
  * NULL never equi-joins, so it needs no bit). */
case class BloomAgg(child: Expression, numBits: Int, numHashes: Int,
                    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && numBits % 64 == 0,
    s"bloom_agg: numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1, s"bloom_agg: numHashes must be >= 1, got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires a string input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.set(buf, v.asInstanceOf[UTF8String], numBits, numHashes)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](buf.length * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    buf.foreach(bb.putLong)
    bytes
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): BloomAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomAgg =
    copy(child = c(0))
}

/** `bloom_contains(bitset, key)` — probe-side membership test; numBits and
  * numHashes must match the building `bloom_agg`. Codegen'd: the probe sits
  * in the scan's filter, inside whole-stage codegen. */
case class BloomContains(left: Expression, right: Expression,
                         numBits: Int, numHashes: Int) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains requires (array<bigint>, string), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(bits: Any, v: Any): Any =
    BloomUtil.contains(bits.asInstanceOf[ArrayData], v.asInstanceOf[UTF8String],
      numBits, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, v) =>
      s"${ev.value} = graft.functions.BloomUtil.contains($bits, $v, $numBits, $numHashes);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomContains =
    copy(left = l, right = r)
}
