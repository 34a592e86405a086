package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.roaringbitmap.longlong.Roaring64Bitmap

/** `roaring_agg(ordinal)` — aggregate a group's long values into ONE
  * serialized Roaring64 bitmap (`binary`), the DISTRIBUTED
  * deletion-vector build: a positional delete over N matched rows ships
  * O(files) compressed bitmap blobs to the driver instead of N
  * (file, ordinal) rows, so the candidate set is unbounded (no driver
  * row cap). Merges OR partial bitmaps, so map-side partial aggregation
  * works: each (file, partition) ships one blob, never the ordinals.
  *
  * Byte discipline: the output is `Roaring64Bitmap.serialize` with NO
  * `runOptimize` — exactly the convention of
  * [[graft.operators.TableFormat]]'s `writeDv`/`readDv` sidecar codec.
  * Roaring container layout is deterministic in CONTENT (not insertion
  * order), so the sidecar a consumer writes from this aggregate is
  * byte-identical to one built by driver-side `addLong` of the same
  * ordinals — proven in DeletionVectorSpec. NULL inputs are skipped. */
case class RoaringAgg(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64Bitmap] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "roaring_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | NullType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"roaring_agg requires a bigint input, got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  override def update(buf: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) buf.addLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Roaring64Bitmap, other: Roaring64Bitmap): Roaring64Bitmap = {
    buf.or(other)
    buf
  }

  override def eval(buf: Roaring64Bitmap): Any = serialize(buf)

  override def serialize(buf: Roaring64Bitmap): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    buf.serialize(new java.io.DataOutputStream(bos))
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    bm.deserialize(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    bm
  }

  override def withNewMutableAggBufferOffset(n: Int): RoaringAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): RoaringAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): RoaringAgg =
    copy(child = c(0))
}
