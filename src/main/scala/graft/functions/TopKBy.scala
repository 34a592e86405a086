package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Per-group top-k as a partial-aggregable Catalyst aggregate.
  *
  * `top_k_by(payload, ord, tie, k)` keeps the k payloads with the highest
  * (ord DESC, tie ASC) rank per group, merged associatively across
  * partitions. Versus the `row_number() OVER (PARTITION BY ...) <= k`
  * formulation — which shuffles EVERY row of the group and sorts it — this
  * ships at most k rows per (group, partition) through the shuffle and never
  * materializes a sort: the map side reduces first, which is the property
  * that matters when one group holds millions of rows at 100 TB.
  *
  * `tie` must order rows totally within equal `ord` values (use a unique
  * id); that is what makes the result deterministic and oracle-checkable.
  * Any atomic orderable type works as the tie (ints, longs, strings, dates
  * — compared with Spark's own ordering for the type).
  */
case class TopKBy(payload: Expression, ord: Expression, tie: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k >= 1, s"top_k_by: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(payload, ord, tie)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)
  override def prettyName: String = "top_k_by"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!ord.dataType.isInstanceOf[NumericType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_by: ord must be numeric, got ${ord.dataType.catalogString}")
    else if (!org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(tie.dataType) ||
        tie.dataType.isInstanceOf[ArrayType] || tie.dataType.isInstanceOf[StructType] ||
        tie.dataType.isInstanceOf[MapType] || tie.dataType == NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_by: tie must be an atomic orderable type, got ${tie.dataType.catalogString}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  private def ordToDouble(o: Any): Double = o match {
    case d: java.lang.Double  => d
    case f: java.lang.Float   => f.toDouble
    case i: java.lang.Integer => i.toDouble
    case l: java.lang.Long    => l.toDouble
    case s: java.lang.Short   => s.toDouble
    case b: java.lang.Byte    => b.toDouble
    case d: Decimal           => d.toDouble
  }

  @transient private lazy val tieOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(tie.dataType)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k, tieOrdering)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val o = ord.eval(input)
    val t = tie.eval(input)
    val p = payload.eval(input)
    if (o != null && t != null && p != null) {
      buf.offer(ordToDouble(o), t, p)
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = { buf.absorb(other); buf }

  override def eval(buf: TopKHeap): Any = new GenericArrayData(buf.sortedPayloads)

  // one projection per operator instance, reused across every buffer
  // serialize at shuffle/spill time (UnsafeProjection.create is expensive);
  // the tie value serializes through the same row as the payload so any
  // atomic tie type round-trips without its own codec
  @transient private lazy val serializeProjection: UnsafeProjection =
    UnsafeProjection.create(Array(payload.dataType, tie.dataType))

  override def serialize(buf: TopKHeap): Array[Byte] = buf.toBytes(serializeProjection)
  override def deserialize(bytes: Array[Byte]): TopKHeap =
    TopKHeap.fromBytes(bytes, k, payload.dataType, tie.dataType, tieOrdering)

  override def withNewMutableAggBufferOffset(n: Int): TopKBy = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKBy = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKBy =
    copy(payload = c(0), ord = c(1), tie = c(2))
}

/** Bounded heap of (ord, tie, payload) keeping the k best under
  * (ord DESC, tie ASC); the heap head is always the current worst so an
  * insert into a full heap is one compare + one sift. */
final class TopKHeap(val k: Int, tieOrd: Ordering[Any]) {

  private val worstFirst: java.util.Comparator[TopKHeap.Entry] =
    (a: TopKHeap.Entry, b: TopKHeap.Entry) => {
      val c = java.lang.Double.compare(a.ord, b.ord)
      if (c != 0) c else tieOrd.compare(b.tie, a.tie)
    }
  private val bestFirst: java.util.Comparator[TopKHeap.Entry] =
    (a: TopKHeap.Entry, b: TopKHeap.Entry) => -worstFirst.compare(a, b)

  /** head = worst kept entry: smallest ord, then largest tie. */
  private val heap = new java.util.PriorityQueue[TopKHeap.Entry](
    math.max(k, 1), worstFirst)

  private def beatsWorst(ordD: Double, tie: Any): Boolean = {
    val w = heap.peek()
    ordD > w.ord || (ordD == w.ord && tieOrd.compare(tie, w.tie) < 0)
  }

  /** Copies of tie and payload are taken only on INSERT — rows a full heap
    * discards cost a compare, not an allocation (beatsWorst only compares,
    * it does not retain the tie). */
  def offer(ordD: Double, tie: Any, value: Any): Unit = {
    if (heap.size < k) {
      heap.add(new TopKHeap.Entry(ordD, InternalRow.copyValue(tie),
        InternalRow.copyValue(value)))
    } else if (beatsWorst(ordD, tie)) {
      heap.poll()
      heap.add(new TopKHeap.Entry(ordD, InternalRow.copyValue(tie),
        InternalRow.copyValue(value)))
    }
  }

  private def offerOwned(e: TopKHeap.Entry): Unit = {
    if (heap.size < k) heap.add(e)
    else if (beatsWorst(e.ord, e.tie)) { heap.poll(); heap.add(e) }
  }

  def absorb(other: TopKHeap): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) offerOwned(it.next()) // entries are already copies
  }

  /** Payloads best-first: (ord DESC, tie ASC). */
  def sortedPayloads: Array[Any] = {
    val arr = heap.toArray(new Array[TopKHeap.Entry](heap.size))
    java.util.Arrays.sort(arr, bestFirst)
    arr.map(_.value)
  }

  def toBytes(proj: UnsafeProjection): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeDouble(e.ord)
      val row = proj.apply(InternalRow(e.value, e.tie))
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
    }
    out.flush()
    bos.toByteArray
  }
}

object TopKHeap {
  final class Entry(val ord: Double, val tie: Any, val value: Any)

  def fromBytes(bytes: Array[Byte], k: Int, dt: DataType, tieDt: DataType,
                tieOrd: Ordering[Any]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val heap = new TopKHeap(k, tieOrd)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val ordD = in.readDouble()
      val size = in.readInt()
      val buf = new Array[Byte](size)
      in.readFully(buf)
      val row = new UnsafeRow(2)
      row.pointTo(buf, size)
      heap.offer(ordD, row.get(1, tieDt), row.get(0, dt)) // offer copies on insert
      i += 1
    }
    heap
  }
}
