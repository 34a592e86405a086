package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch.
  *
  * `kmv_distinct(col, k)` keeps the k smallest distinct 48-bit md5 hashes of
  * the input and estimates distinct count as (k-1) * 2^48 / kth_min — the
  * classic bottom-k estimator. The buffer is a bounded sorted set (k longs),
  * merges are unions re-truncated to k, and partial aggregation works
  * map-side, so a 100 TB distinct-count costs k longs per (group, partition)
  * through the shuffle instead of shuffling the values themselves.
  *
  * Unlike HLL sketches (whose register layouts differ per engine), every
  * term here is md5-derived and exactly reproducible, so the DuckDB oracle
  * can verify the estimate bit-for-bit. Exact fallback: when fewer than k
  * distinct hashes exist, the sketch holds ALL of them and returns the
  * exact count.
  */
case class KmvDistinct(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 2, s"kmv_distinct: k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_distinct"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_distinct requires a string input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.offer(TextHashUtil.md5Prefix48(v.asInstanceOf[UTF8String].getBytes))
    }
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = { buf.absorb(other); buf }

  override def eval(buf: KmvBuffer): Any = buf.estimate

  override def serialize(buf: KmvBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KmvBuffer = KmvBuffer.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(n: Int): KmvDistinct = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvDistinct = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvDistinct =
    copy(child = c(0))
}

/** Bounded sorted set of the k smallest distinct hashes. */
final class KmvBuffer(val k: Int) {
  private val set = new java.util.TreeSet[java.lang.Long]()

  def offer(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (h < set.last() && !set.contains(h)) {
      set.pollLast()
      set.add(h)
    }
  }

  def absorb(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) offer(it.next().longValue())
  }

  /** (k-1) * 2^48 / kth_min when the sketch is full; exact |set| below k. */
  def estimate: Double =
    if (set.size < k) set.size.toDouble
    else (k - 1).toDouble * KmvBuffer.HashSpace / set.last().toDouble

  /** The sketch's hashes, ascending. */
  def values: Array[Long] = {
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    out
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(set.size)
    val it = set.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }
}

/** [[KmvDistinct]]'s MERGEABLE twin: evaluates to the sketch ITSELF (the
  * sorted k smallest distinct hashes, `array<long>`) instead of the
  * estimate — what a metadata layer stores PER FILE so later reads can
  * union sketches and estimate global distinct counts with zero data IO
  * ([[graft.operators.TableFormat.approxDistinctKeys]]). Mergeability is
  * exact, not approximate: the global k smallest distinct hashes are
  * always contained in the union of per-file k smallest, so merging
  * sketches reproduces bit-for-bit the sketch a single pass over the
  * union would build. */
case class KmvSketchValues(child: Expression, k: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 2, s"kmv_sketch: k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch requires a string input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.offer(TextHashUtil.md5Prefix48(v.asInstanceOf[UTF8String].getBytes))
    }
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = { buf.absorb(other); buf }

  override def eval(buf: KmvBuffer): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.values)

  override def serialize(buf: KmvBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KmvBuffer = KmvBuffer.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(n: Int): KmvSketchValues = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvSketchValues = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSketchValues =
    copy(child = c(0))
}

object KmvBuffer {
  /** 2^48 — the md5Prefix48 hash space. */
  val HashSpace: Double = 281474976710656.0

  def fromBytes(bytes: Array[Byte], k: Int): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.offer(in.readLong()); i += 1 }
    buf
  }
}
