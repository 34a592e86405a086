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

/** Aggregate calls the reader can evaluate partially (one partial row per
  * file partition; Spark runs the final merge) — the engine-side analog of
  * the reference's server-computed TransactionsSummary (monarchmoney.py:
  * 1384-1395: count/min/max/sum evaluated where the data lives). */
private sealed trait AggCall
private case object CountStarCall extends AggCall
private case class CountCall(field: String) extends AggCall
private case class MinCall(field: String) extends AggCall
private case class MaxCall(field: String) extends AggCall
private case class SumCall(field: String) extends AggCall

/** One sort key of a pushed TopN: (field, ascending, nullsFirst). */
private case class SortKey(field: String, asc: Boolean, nullsFirst: Boolean) {
  override def toString: String =
    s"$field ${if (asc) "ASC" else "DESC"} NULLS ${if (nullsFirst) "FIRST" else "LAST"}"
}

private class TxnScanBuilder(path: String)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns with SupportsPushDownLimit
  with SupportsPushDownTopN with SupportsPushDownOffset
  with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = MonarchTransactionsV2.schema
  private var limit: Int = -1
  private var sortKeys: Seq[SortKey] = Nil
  private var offset: Int = 0
  private var aggCalls: Seq[AggCall] = Nil

  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate._

  private def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case fr: NamedReference if fr.fieldNames().length == 1 =>
        Some(fr.fieldNames()(0)).filter(MonarchTransactionsV2.schema.fieldNames.contains)
      case _ => None
    }

  /** Partial pushdown only: each partition returns its local (per-group)
    * aggregate and Spark merges — correct under any partitioning, no global
    * coordination in the source. COUNT/MIN/MAX/SUM over the scannable
    * fields, optionally grouped by source columns; anything else stays in
    * Spark. */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false

  private var groupFields: Seq[String] = Nil

  /** Group-by is limited to the dimension-like columns: the reader folds
    * groups in memory (one state per group per partition), which is the
    * right trade for bounded-cardinality keys and strictly worse than
    * Spark's spilling hash aggregate for a unique key like `id`. */
  private val groupableFields = Set("date", "account_id", "category", "merchant", "pending")

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val groups: Seq[Option[String]] =
      aggregation.groupByExpressions().toSeq.map(e =>
        fieldOf(e).filter(groupableFields.contains))
    if (groups.exists(_.isEmpty)) return false
    val resolved: Seq[Option[AggCall]] = aggregation.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(CountStarCall)
      case c: Count if !c.isDistinct => fieldOf(c.column).map(CountCall)
      case m: Min => fieldOf(m.column).map(MinCall)
      case m: Max => fieldOf(m.column).map(MaxCall)
      case s: Sum if !s.isDistinct =>
        // summable = double-typed (the dataType is the constraint, not a name)
        fieldOf(s.column).filter(f =>
          MonarchTransactionsV2.schema(f).dataType == DoubleType).map(SumCall)
      case _ => None
    }
    if (resolved.exists(_.isEmpty)) return false
    if (groups.isEmpty && resolved.isEmpty) return false // nothing to push
    groupFields = groups.flatten
    aggCalls = resolved.flatten
    true
  }

  /** Scan output for pushed aggregation: group columns first, then one
    * column per aggregate call (Spark binds by position). */
  private def aggSchema: StructType = StructType(
    groupFields.map(f => MonarchTransactionsV2.schema(f)) ++
    aggCalls.map {
      case CountStarCall => StructField("count_star", LongType, nullable = false)
      case CountCall(f) => StructField(s"count_$f", LongType, nullable = false)
      case MinCall(f) =>
        StructField(s"min_$f", MonarchTransactionsV2.schema(f).dataType, nullable = true)
      case MaxCall(f) =>
        StructField(s"max_$f", MonarchTransactionsV2.schema(f).dataType, nullable = true)
      case SumCall(f) => StructField(s"sum_$f", DoubleType, nullable = true)
    })

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
      // null probes must be consumable: Spark injects IsNotNull beside most
      // predicates, and any residual filter blocks aggregate pushdown
      case IsNotNull(a) => MonarchTransactionsV2.schema.fieldNames.contains(a)
      case IsNull(a) => MonarchTransactionsV2.schema.fieldNames.contains(a)
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(l: Int): Boolean = { limit = l; true }

  /** A plain limit is applied per partition (partial — Spark re-limits
    * globally); a pushed TopN is evaluated COMPLETELY (single coordinated
    * reader), so Spark removes both the Sort and the Limit. The two
    * interfaces share this flag, hence the dynamic answer. */
  override def isPartiallyPushed: Boolean = sortKeys.isEmpty

  /** Server-side ordered pagination, the reference's
    * `orderBy: "date"` + offset/limit contract (monarchmoney.py:1443-1446;
    * driver loop MonarchMoneyMain-v3.py:344-391): accept a TopN whose
    * every key is a plain schema column. Evaluated completely — the scan
    * plans ONE reader that streams all files through a bounded heap of
    * size limit(+offset), so memory is O(page), IO one pass, and no
    * Sort/Limit/Offset runs above the scan. Mutually exclusive with
    * aggregate pushdown (different output shape). */
  override def pushTopN(orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
                        l: Int): Boolean = {
    if (aggCalls.nonEmpty || groupFields.nonEmpty) return false
    import org.apache.spark.sql.connector.expressions.{NullOrdering, SortDirection}
    val keys = orders.toSeq.map { o =>
      fieldOf(o.expression()).map(f => SortKey(f,
        o.direction() == SortDirection.ASCENDING,
        o.nullOrdering() == NullOrdering.NULLS_FIRST))
    }
    if (keys.isEmpty || keys.exists(_.isEmpty)) return false
    sortKeys = keys.flatten
    limit = l
    true
  }

  /** Offset composes only with an ORDERED scan (a bare offset over an
    * unordered multi-file read is nondeterministic — left in Spark). With
    * a pushed TopN Spark hands us limit+offset as the TopN bound and the
    * offset separately; the reader skips `offset` rows of the sorted
    * prefix. */
  override def pushOffset(o: Int): Boolean =
    if (sortKeys.nonEmpty) { offset = o; true } else false

  override def build(): Scan = {
    // group-by-only pushdown (a distinct()) has aggCalls empty but still
    // needs the aggregated schema and the folding reader
    val aggregating = aggCalls.nonEmpty || groupFields.nonEmpty
    val schema = if (aggregating) aggSchema else required
    new TxnScan(path, pushed, schema, limit, aggCalls, groupFields,
      sortKeys, offset)
  }
}

private class TxnScan(path: String, filters: Array[Filter],
                      required: StructType, limit: Int,
                      aggCalls: Seq[AggCall], groupFields: Seq[String],
                      sortKeys: Seq[SortKey] = Nil, offset: Int = 0) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"monarch-txns PushedFilters: [${filters.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}, Limit: $limit" +
      (if (sortKeys.nonEmpty)
        s", PushedTopN: [${sortKeys.mkString(", ")}], PushedOffset: $offset"
      else "") +
      (if (aggCalls.nonEmpty)
        s", PushedAggregates: [${aggCalls.mkString(", ")}], " +
          s"PushedGroupBy: [${groupFields.mkString(", ")}]"
      else "")
  override def toBatch: Batch = this

  private def listFiles(): Array[String] = {
    val p = Paths.get(path)
    if (Files.isDirectory(p)) {
      val stream = Files.list(p)
      try stream.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".jsonl")).toArray.sorted
      finally stream.close()
    } else Array(p.toString)
  }

  override def planInputPartitions(): Array[InputPartition] =
    if (sortKeys.nonEmpty)
      // complete TopN+offset: ONE coordinated reader over all files in
      // deterministic order (the "server" answering one page request) —
      // work and memory bounded by the page, not the table
      Array(TxnAllFilesPartition(listFiles().toSeq))
    else listFiles().map(f => TxnFilePartition(f): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    new TxnReaderFactory(filters, required, limit, aggCalls, groupFields,
      sortKeys, offset)
}

private case class TxnFilePartition(file: String) extends InputPartition
private case class TxnAllFilesPartition(files: Seq[String]) extends InputPartition

private class TxnReaderFactory(filters: Array[Filter], required: StructType,
                               limit: Int, aggCalls: Seq[AggCall],
                               groupFields: Seq[String],
                               sortKeys: Seq[SortKey] = Nil, offset: Int = 0)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case TxnAllFilesPartition(files) =>
        new TxnTopNReader(files, filters, required, sortKeys, limit, offset)
      case TxnFilePartition(file) =>
        if (aggCalls.nonEmpty || groupFields.nonEmpty)
          new TxnAggReader(file, filters, groupFields, aggCalls)
        else new TxnPartitionReader(file, filters, required, limit)
    }
}

/** Complete TopN + offset evaluation — the "server" answering one page
  * request. Each file streams once through its OWN bounded max-heap of the
  * best `limit` records (Spark already folded the offset into the TopN
  * bound), the per-file folds run CONCURRENTLY on a scan thread pool (a
  * sharded server fans the page request out to its shards — wall time is
  * table/shards, not table), and the final page is selected from the
  * ≤ files × limit local survivors — merge work bounded by the page times
  * the shard count, never the table. Memory is O(files × limit) entries.
  * Sort keys are evaluated from the parsed record, so they need not
  * survive column pruning. Ties beyond the sort keys keep an unspecified
  * subset (standard SQL TopN semantics — callers wanting a stable page
  * sort on a unique key suffix, as the reference's date-ordered
  * pagination does with its id tie-break). */
private class TxnTopNReader(files: Seq[String], filters: Array[Filter],
                            required: StructType, sortKeys: Seq[SortKey],
                            limit: Int, offset: Int)
  extends PartitionReader[InternalRow] {

  private class Stream(f: String) extends TxnJsonlReaderBase(f, filters) {
    def nextRec(): JsonNode = nextMatching()
    override def next(): Boolean = false
    override def get(): InternalRow = null
    def rowVal(v: Any): Any = toRowValue(v)
    def fv(node: JsonNode, name: String): Any = fieldValue(node, name)
  }

  private case class Entry(keys: Array[Any], row: Array[Any])

  private var out: Iterator[InternalRow] = _
  private var current: InternalRow = _

  /** Output-order comparison of two key vectors (nullsFirst/direction are
    * absolute, the Spark SortOrder contract). Pure value comparison
    * ([[TxnValues.compareInternal]]) — safe from any scan thread. */
  private def compareKeys(a: Array[Any], b: Array[Any]): Int = {
    var i = 0
    while (i < sortKeys.length) {
      val k = sortKeys(i)
      val (x, y) = (a(i), b(i))
      val c =
        if (x == null && y == null) 0
        else if (x == null) { if (k.nullsFirst) -1 else 1 }
        else if (y == null) { if (k.nullsFirst) 1 else -1 }
        else { val c0 = TxnValues.compareInternal(k.field, x, y); if (k.asc) c0 else -c0 }
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** One file's local top-`limit` fold — independent of every other file's. */
  private def foldFile(f: String): java.util.PriorityQueue[Entry] = {
    val s = new Stream(f)
    try {
      // max-heap: root = worst kept entry in output order
      val heap = new java.util.PriorityQueue[Entry](limit,
        (a: Entry, b: Entry) => -compareKeys(a.keys, b.keys))
      var node = s.nextRec()
      while (node != null) {
        val keys = sortKeys.map(k => s.fv(node, k.field)).toArray
        if (heap.size < limit) {
          heap.add(Entry(keys,
            required.fields.map(fd => s.rowVal(s.fv(node, fd.name)))))
        } else if (compareKeys(keys, heap.peek().keys) < 0) {
          heap.poll()
          heap.add(Entry(keys,
            required.fields.map(fd => s.rowVal(s.fv(node, fd.name)))))
        }
        node = s.nextRec()
      }
      heap
    } finally s.close()
  }

  private def fold(): Iterator[InternalRow] = {
    if (limit == 0) return Iterator.empty
    require(limit > 0, s"TopN pushdown without a limit bound: $limit")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(files.size, Runtime.getRuntime.availableProcessors())))
    val locals =
      try {
        val futures = files.map(f =>
          pool.submit(new java.util.concurrent.Callable[java.util.PriorityQueue[Entry]] {
            override def call(): java.util.PriorityQueue[Entry] = foldFile(f)
          }))
        futures.map(_.get())
      } finally pool.shutdown()
    // global page = best `limit` of the local survivors (≤ files × limit)
    val all = new java.util.ArrayList[Entry]()
    locals.foreach(h => all.addAll(h))
    all.sort((a: Entry, b: Entry) => compareKeys(a.keys, b.keys))
    all.iterator().asScala.slice(offset, limit)
      .map(e => InternalRow.fromSeq(e.row.toSeq))
  }

  override def next(): Boolean = {
    if (out == null) out = fold()
    if (out.hasNext) { current = out.next(); true } else false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Executor-side partial aggregation: streams the partition's lines once,
  * folds the pushed aggregate calls over the filter-matching records per
  * group key, and emits one partial row per group. Ungrouped aggregation
  * always emits its single row (count 0 / null min-max-sum on an empty
  * match set); grouped aggregation over an empty match set emits nothing —
  * both exactly what Spark's final merge expects. */
private class TxnAggReader(file: String, filters: Array[Filter],
                           groupFields: Seq[String], aggCalls: Seq[AggCall])
  extends TxnJsonlReaderBase(file, filters) {

  private final class State {
    val counts = new Array[Long](aggCalls.length)
    val mins = new Array[Any](aggCalls.length)
    val maxs = new Array[Any](aggCalls.length)
    val sums = new Array[Double](aggCalls.length)
    val seen = new Array[Boolean](aggCalls.length)
  }

  private var rows: Iterator[InternalRow] = _
  private var current: InternalRow = _

  private def fold(): Iterator[InternalRow] = {
    val states = new java.util.LinkedHashMap[Seq[Any], State]()
    if (groupFields.isEmpty) states.put(Nil, new State) // global agg: always one row
    var node = nextMatching()
    while (node != null) {
      val key = groupFields.map(f => fieldValue(node, f))
      val st = states.computeIfAbsent(key, _ => new State)
      var i = 0
      while (i < aggCalls.length) {
        aggCalls(i) match {
          case CountStarCall => st.counts(i) += 1
          case CountCall(f) => if (fieldValue(node, f) != null) st.counts(i) += 1
          case MinCall(f) =>
            val v = fieldValue(node, f)
            if (v != null && (!st.seen(i) || compareInternal(f, v, st.mins(i)) < 0)) {
              st.mins(i) = v; st.seen(i) = true
            }
          case MaxCall(f) =>
            val v = fieldValue(node, f)
            if (v != null && (!st.seen(i) || compareInternal(f, v, st.maxs(i)) > 0)) {
              st.maxs(i) = v; st.seen(i) = true
            }
          case SumCall(f) =>
            val v = fieldValue(node, f)
            if (v != null) { st.sums(i) += v.asInstanceOf[Double]; st.seen(i) = true }
        }
        i += 1
      }
      node = nextMatching()
    }
    states.entrySet().iterator().asScala.map { e =>
      val st = e.getValue
      InternalRow.fromSeq(e.getKey.map(toRowValue) ++ aggCalls.zipWithIndex.map {
        case (CountStarCall, i) => st.counts(i)
        case (CountCall(_), i) => st.counts(i)
        case (MinCall(_), i) => if (st.seen(i)) toRowValue(st.mins(i)) else null
        case (MaxCall(_), i) => if (st.seen(i)) toRowValue(st.maxs(i)) else null
        case (SumCall(_), i) => if (st.seen(i)) st.sums(i) else null
      })
    }
  }

  override def next(): Boolean = {
    if (rows == null) rows = fold()
    if (rows.hasNext) { current = rows.next(); true } else false
  }

  override def get(): InternalRow = current
}

/** Stateless value comparisons shared by the readers and the concurrent
  * TopN fold (no reader instance required — safe from any scan thread). */
private object TxnValues {
  /** Compare two reader-internal values of the same field. Strings compare
    * in UTF-8 BINARY order (Spark's StringType ordering) — java.lang.String
    * compareTo is UTF-16 code-unit order, which inverts min/max for
    * supplementary characters vs U+E000..U+FFFF. */
  def compareInternal(name: String, a: Any, b: Any): Int = name match {
    case "date" => a.asInstanceOf[Int].compareTo(b.asInstanceOf[Int])
    case "amount" => a.asInstanceOf[Double].compareTo(b.asInstanceOf[Double])
    case "pending" => a.asInstanceOf[Boolean].compareTo(b.asInstanceOf[Boolean])
    case _ => UTF8String.fromString(a.asInstanceOf[String])
      .compareTo(UTF8String.fromString(b.asInstanceOf[String]))
  }
}

/** Shared executor-side JSONL machinery: line streaming, record parsing,
  * pushed-filter evaluation. Values use the reader-internal representation
  * (date = epoch-day Int, strings = java String until row construction). */
private abstract class TxnJsonlReaderBase(file: String, filters: Array[Filter])
  extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val lines = Files.newBufferedReader(Paths.get(file), StandardCharsets.UTF_8)

  protected def fieldValue(node: JsonNode, name: String): Any = {
    val v = node.get(name)
    if (v == null || v.isNull) null
    else name match {
      case "id" | "account_id" | "category" | "merchant" => v.asText()
      case "amount" => v.asDouble()
      case "pending" => v.asBoolean()
      case "date" => java.time.LocalDate.parse(v.asText()).toEpochDay.toInt
    }
  }

  /** Compare an internal value against a FILTER literal (Spark-typed). */
  protected def compareTo(name: String, value: Any, filterValue: Any): Int = name match {
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

  /** Compare two reader-internal values of the same field (see
    * [[TxnValues.compareInternal]]). */
  protected def compareInternal(name: String, a: Any, b: Any): Int =
    TxnValues.compareInternal(name, a, b)

  /** Reader-internal value -> InternalRow representation. */
  protected def toRowValue(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case other => other
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
    case IsNotNull(a) => fieldValue(node, a) != null
    case IsNull(a) => fieldValue(node, a) == null
    case _ => true
  }

  /** Next filter-matching parsed record, or null at end of file. */
  protected def nextMatching(): JsonNode = {
    var line = lines.readLine()
    while (line != null) {
      if (line.nonEmpty) {
        val node = mapper.readTree(line)
        if (matches(node)) return node
      }
      line = lines.readLine()
    }
    null
  }

  override def close(): Unit = lines.close()
}

/** Executor-side row reader: emits only the required columns, stops at the
  * pushed limit. */
private class TxnPartitionReader(file: String, filters: Array[Filter],
                                 required: StructType, limit: Int)
  extends TxnJsonlReaderBase(file, filters) {

  private var current: InternalRow = _
  private var emitted = 0

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    val node = nextMatching()
    if (node == null) return false
    current = InternalRow.fromSeq(
      required.fields.map(f => toRowValue(fieldValue(node, f.name))).toSeq)
    emitted += 1
    true
  }

  override def get(): InternalRow = current
}
