package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 source for line-delimited Monarch-shaped transaction records,
  * with operator pushdown — the engine-side mirror of the reference's
  * server-side query execution: the GraphQL `TransactionFilterInput`
  * (monarchmoney.py:1510-1550) ships predicates to the server so non-matching
  * rows never cross the wire; here `SupportsPushDownFilters` ships them into
  * the reader so non-matching rows never enter the plan. Field-selection
  * fragments (P1) map to `SupportsPushDownRequiredColumns`, and the page
  * limit (`results(limit:)`, lib:1446) to `SupportsPushDownLimit`.
  *
  * Usage: `spark.read.format("monarch-txns").load(path)` where path holds
  * JSONL files (one flat transaction record per line).
  *
  * Scale notes: one input partition per file (a production source would split
  * by byte range); filters are evaluated during parsing so pruned rows cost
  * one Jackson parse and zero Spark processing; limit is applied per
  * partition (Spark re-applies the global limit above, which is the V2
  * contract).
  */
class MonarchTransactionsV2 extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "monarch-txns"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MonarchTransactionsV2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new TxnTable(properties.asScala.getOrElse("path",
      throw new IllegalArgumentException("monarch-txns requires a path")))
}

object MonarchTransactionsV2 {
  /** Flat transaction record (the post-flatten shape §1.4 works in). */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("date", DateType),
    StructField("amount", DoubleType),
    StructField("account_id", StringType),
    StructField("category", StringType),
    StructField("merchant", StringType),
    StructField("pending", BooleanType)))
}

private class TxnTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"monarch-txns($path)"
  override def schema(): StructType = MonarchTransactionsV2.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TxnScanBuilder(path)
}

private class TxnScanBuilder(path: String)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = MonarchTransactionsV2.schema
  private var limit: Int = -1

  /** Accept the filter shapes the reference's TransactionFilterInput can
    * express (equality, id-set membership, date/amount bounds); anything else
    * — including null-bearing In-lists, whose null-vs-match semantics differ
    * from this reader's null-skipping evaluation — stays in Spark as a
    * post-filter. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo(a, v) => v != null && MonarchTransactionsV2.schema.fieldNames.contains(a)
      case In(a, vs) =>
        vs != null && !vs.contains(null) && MonarchTransactionsV2.schema.fieldNames.contains(a)
      case GreaterThan(a, _) => a == "date" || a == "amount"
      case GreaterThanOrEqual(a, _) => a == "date" || a == "amount"
      case LessThan(a, _) => a == "date" || a == "amount"
      case LessThanOrEqual(a, _) => a == "date" || a == "amount"
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed: Boolean = true

  override def build(): Scan = new TxnScan(path, pushed, required, limit)
}

private class TxnScan(path: String, filters: Array[Filter],
                      required: StructType, limit: Int) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"monarch-txns PushedFilters: [${filters.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}, Limit: $limit"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val p = Paths.get(path)
    val files =
      if (Files.isDirectory(p)) {
        val stream = Files.list(p)
        try stream.iterator().asScala.filter(f => f.toString.endsWith(".jsonl")).toArray
        finally stream.close()
      } else Array(p)
    files.map(f => TxnFilePartition(f.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TxnReaderFactory(filters, required, limit)
}

private case class TxnFilePartition(file: String) extends InputPartition

private class TxnReaderFactory(filters: Array[Filter], required: StructType,
                               limit: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TxnPartitionReader(partition.asInstanceOf[TxnFilePartition].file,
      filters, required, limit)
}

/** Executor-side reader: streams JSONL lines, evaluates the pushed filters on
  * the parsed record, emits only the required columns, stops at the pushed
  * limit. */
private class TxnPartitionReader(file: String, filters: Array[Filter],
                                 required: StructType, limit: Int)
  extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val lines = Files.newBufferedReader(Paths.get(file), StandardCharsets.UTF_8)
  private var current: InternalRow = _
  private var emitted = 0

  private def fieldValue(node: JsonNode, name: String): Any = {
    val v = node.get(name)
    if (v == null || v.isNull) null
    else name match {
      case "id" | "account_id" | "category" | "merchant" => v.asText()
      case "amount" => v.asDouble()
      case "pending" => v.asBoolean()
      case "date" => java.time.LocalDate.parse(v.asText()).toEpochDay.toInt
    }
  }

  private def compareTo(name: String, value: Any, filterValue: Any): Int = name match {
    case "date" =>
      // Spark ships date literals as java.sql.Date, or java.time.LocalDate
      // when spark.sql.datetime.java8API.enabled is set
      val filterDays = filterValue match {
        case d: java.sql.Date        => d.toLocalDate.toEpochDay.toInt
        case d: java.time.LocalDate  => d.toEpochDay.toInt
        case other => throw new IllegalArgumentException(
          s"unsupported date filter value: ${other.getClass.getName}")
      }
      value.asInstanceOf[Int].compareTo(filterDays)
    case "amount" =>
      value.asInstanceOf[Double].compareTo(filterValue.asInstanceOf[Number].doubleValue())
    case _ => value.toString.compareTo(filterValue.toString)
  }

  private def matches(node: JsonNode): Boolean = filters.forall {
    case EqualTo(a, v) =>
      val x = fieldValue(node, a); x != null && compareTo(a, x, v) == 0
    case In(a, vs) =>
      val x = fieldValue(node, a); x != null && vs.exists(v => compareTo(a, x, v) == 0)
    case GreaterThan(a, v) =>
      val x = fieldValue(node, a); x != null && compareTo(a, x, v) > 0
    case GreaterThanOrEqual(a, v) =>
      val x = fieldValue(node, a); x != null && compareTo(a, x, v) >= 0
    case LessThan(a, v) =>
      val x = fieldValue(node, a); x != null && compareTo(a, x, v) < 0
    case LessThanOrEqual(a, v) =>
      val x = fieldValue(node, a); x != null && compareTo(a, x, v) <= 0
    case _ => true
  }

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    var line = lines.readLine()
    while (line != null) {
      if (line.nonEmpty) {
        val node = mapper.readTree(line)
        if (matches(node)) {
          current = InternalRow.fromSeq(required.fields.map { f =>
            fieldValue(node, f.name) match {
              case s: String => UTF8String.fromString(s)
              case other => other
            }
          }.toSeq)
          emitted += 1
          return true
        }
      }
      line = lines.readLine()
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}
