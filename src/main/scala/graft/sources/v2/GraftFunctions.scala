package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog's V2 FUNCTIONS — the partition-spec transforms as bound,
  * evaluable scalar functions. Spark resolves storage-partitioned-join
  * keys (`KeyGroupedPartitioning`) through the scan relation's
  * `FunctionCatalog`, so these definitions ARE the join-compatibility
  * contract: two scans co-locate iff their transforms bind to functions
  * with equal canonical names and arguments. Semantics must therefore
  * agree EXACTLY with the three places the same images already live —
  * the routed writers (`TableFormat.specValue`, the SQL writer's
  * `routerOf`) and the recorded per-file tuples (`TableFormat.termLong`):
  *
  *  - `bucket(n, v)`  = floorMod(zoneLong(v), n)
  *  - `months(v)`     = months since 1970-01 of the UTC epoch day
  *  - `div(v, w)`     = floorDiv(zoneLong(v), w)
  *
  * where zoneLong is the format's canonical long image (integrals cast,
  * DATE = epoch days, TIMESTAMP = epoch micros). All three are also
  * SQL-invocable (`SELECT graft.bucket(8, k)`) — handy for validating a
  * layout by hand. Null routing values yield null (the writers give
  * such rows their own "null" partition; a null never equals anything
  * in a join, so co-location is unaffected). */
object GraftFunctions {
  val names: Seq[String] = Seq("bucket", "months", "div")

  def load(name: String): UnboundFunction = name match {
    case "bucket" => BucketUnbound
    case "months" => MonthsUnbound
    case "div" => DivUnbound
    case other => throw new NoSuchElementException(
      s"graft catalog: no function '$other' (have: ${names.mkString(", ")})")
  }

  /** The zone-long image of a bound argument (mirrors
    * [[graft.operators.TableFormat.zoneLong]] over internal values:
    * DATE arrives as epoch days (int), TIMESTAMP as epoch micros). */
  private def zoneLongAt(row: InternalRow, i: Int, dt: DataType): Long =
    dt match {
      case ByteType => row.getByte(i).toLong
      case ShortType => row.getShort(i).toLong
      case IntegerType | DateType => row.getInt(i).toLong
      case LongType | TimestampType | TimestampNTZType => row.getLong(i)
      case other => throw new UnsupportedOperationException(
        s"graft function over ${other.simpleString}")
    }

  private def discrete(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  private object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): floorMod of the column's zone-long image — the " +
        "spec's bucket(col, n) routing value"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2 &&
        (inputType.fields(0).dataType == IntegerType ||
          inputType.fields(0).dataType == LongType) &&
        discrete(inputType.fields(1).dataType),
        s"bucket(n, col) needs (int, discrete column), got $inputType")
      BoundBucket(inputType.fields(0).dataType, inputType.fields(1).dataType)
    }
  }

  private final case class BoundBucket(nType: DataType, vType: DataType)
      extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(nType, vType)
    override def resultType(): DataType = LongType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def produceResult(input: InternalRow): java.lang.Long =
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else {
        val n =
          if (nType == IntegerType) input.getInt(0).toLong else input.getLong(0)
        Math.floorMod(zoneLongAt(input, 1, vType), n)
      }
  }

  private object MonthsUnbound extends UnboundFunction {
    override def name(): String = "months"
    override def description(): String =
      "months(col): months since 1970-01 of the UTC epoch day — the " +
        "spec's month(col) routing value"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1 &&
        (inputType.fields(0).dataType == DateType ||
          inputType.fields(0).dataType == TimestampType ||
          inputType.fields(0).dataType == TimestampNTZType),
        s"months(col) needs a DATE or TIMESTAMP column, got $inputType")
      BoundMonths(inputType.fields(0).dataType)
    }
  }

  private final case class BoundMonths(vType: DataType)
      extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(vType)
    override def resultType(): DataType = LongType
    override def name(): String = "months"
    override def canonicalName(): String = "graft.months"
    override def produceResult(input: InternalRow): java.lang.Long =
      if (input.isNullAt(0)) null
      else {
        val days = vType match {
          case DateType => input.getInt(0).toLong
          case _ => Math.floorDiv(input.getLong(0), 86400000000L)
        }
        val d = java.time.LocalDate.ofEpochDay(days)
        (d.getYear - 1970).toLong * 12L + (d.getMonthValue - 1)
      }
  }

  private object DivUnbound extends UnboundFunction {
    override def name(): String = "div"
    override def description(): String =
      "div(col, w): floorDiv of the column's zone-long image — the " +
        "spec's div(col, w) routing value"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2 &&
        discrete(inputType.fields(0).dataType) &&
        (inputType.fields(1).dataType == LongType ||
          inputType.fields(1).dataType == IntegerType),
        s"div(col, w) needs (discrete column, integral width), got $inputType")
      BoundDiv(inputType.fields(0).dataType, inputType.fields(1).dataType)
    }
  }

  private final case class BoundDiv(vType: DataType, wType: DataType)
      extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(vType, wType)
    override def resultType(): DataType = LongType
    override def name(): String = "div"
    override def canonicalName(): String = "graft.div"
    override def produceResult(input: InternalRow): java.lang.Long =
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else {
        val w =
          if (wType == IntegerType) input.getInt(1).toLong else input.getLong(1)
        Math.floorDiv(zoneLongAt(input, 0, vType), w)
      }
  }
}
