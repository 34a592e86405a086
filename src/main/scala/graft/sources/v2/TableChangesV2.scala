package graft.sources.v2

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TableFormat

/** STRUCTURED STREAMING source over a [[TableFormat]] table — the Delta
  * "table as a stream" shape as a real DataSourceV2 `MicroBatchStream`:
  * `spark.readStream.format("graft-table-changes").load(root)` turns the
  * table's append-only commit log into a stream of its appended rows.
  *
  * Offsets ARE table versions — the streaming checkpoint stores a plain
  * version number, so exactly-once delivery across restarts derives from
  * the same monotone log every batch reader uses (no side-channel state,
  * the discipline every sink in [[graft.streaming.Streams]] follows). A
  * micro-batch covers the commit window `(start, end]`; each commit
  * contributes ONE input partition per file it APPENDED, planned with
  * pure driver arithmetic over the already-resolved snapshots (the
  * file-set diff [[TableFormat.changesBetween]] uses) — zero data IO at
  * planning time, and a partition per file means a 1000-file ingest
  * burst fans out across the cluster.
  *
  * Emission semantics (Delta's `ignoreChanges` contract, documented not
  * accidental): op=replace commits (compaction, manifest maintenance,
  * clustering rewrites) are SKIPPED ENTIRELY — content-preserving by the
  * format's contract, so the stream never re-emits a compacted table.
  * Other commits emit exactly the rows of their appended files: an
  * append emits its batch, a merge-on-read upsert emits the new row
  * versions (consumers see upserts as fresh rows), and a copy-on-write
  * rewrite re-emits rewritten survivors — downstream either dedups on
  * key or, for full CDC fidelity, consumes [[TableFormat.changesBetween]]
  * / [[TableFormat.replicateTo]] instead. Masks are not applied to
  * appended files: within their own commit no manifest can apply to
  * them (the strict seq rule), and later deletes are later commits.
  *
  * Every row carries `_commit_version` (the Delta `_commit_version`
  * metadata column): per-commit lineage for free, and what lets a
  * consumer grade exactly which commit produced which rows. Schema
  * comes from the LATEST snapshot's committed DDL (never footer
  * inference); files written before a column existed read it as null.
  * Supported leaf types: long/int/double/float/string/boolean plus
  * DATE, TIMESTAMP (INT64 millis/micros/nanos and legacy INT96) and
  * DECIMAL — the reference's data model is date/timestamp-first
  * (`v3:139-179` ISO date keys), so a Transactions-shaped table rides
  * the stream without casting. The table KEY stays integral (the
  * format's zone/bloom machinery is long-keyed). */
class TableChangesV2 extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-table-changes"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TableChangesV2.streamSchema(TableChangesV2.rootOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new ChangesTable(TableChangesV2.rootOf(
      new CaseInsensitiveStringMap(properties)), schema)
}

object TableChangesV2 {
  val VersionColumn = "_commit_version"

  private[v2] def rootOf(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).getOrElse(options.get("paths"))
    require(p != null && p.nonEmpty, "graft-table-changes: missing path")
    // load(path) arrives as a JSON array in "paths" for some call shapes
    if (p.startsWith("[")) new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(p).get(0).asText()
    else p
  }

  private[v2] def streamSchema(root: String): StructType = {
    val spark = SparkSession.active
    val snap = TableFormat.snapshot(spark, root)
    val ddl = snap.schemaDdl.getOrElse(throw new IllegalArgumentException(
      s"graft-table-changes: table at $root carries no committed schema"))
    StructType(StructType.fromDDL(ddl).fields :+
      StructField(VersionColumn, LongType, nullable = false))
  }
}

private class ChangesTable(root: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-table-changes($root)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new ChangesScan(root, tableSchema,
        ChangesStream.readOptions(options))
    }
}

private class ChangesScan(root: String, schema: StructType,
                          opts: ChangesStream.ReadOptions) extends Scan {
  override def readSchema(): StructType = schema
  override def description(): String = s"graft-table-changes($root)"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ChangesStream(root, schema, opts)
}

private case class VersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

private case class TableFilePartition(file: String, version: Long)
  extends InputPartition

private[v2] object ChangesStream {
  /** The stream's option bundle:
    *  - `starting_version` — Delta's option with Delta's documented
    *    INCLUSIVE semantics: `n` starts the stream AT version n (n's own
    *    commit is the first one emitted — "I hold the state as of n-1");
    *    `latest` starts at the current head. Absent = the full table
    *    (the first live version emits as base). Only consulted for a
    *    FRESH checkpoint — a resumed query's offset always wins.
    *  - `max_versions_per_trigger` / `max_files_per_trigger` /
    *    `max_bytes_per_trigger` — ADMISSION CONTROL (the Delta
    *    maxFilesPerTrigger/maxBytesPerTrigger shape): cap how much of a
    *    pending backlog one micro-batch plans, so a fresh checkpoint on
    *    a large table (or an ingest burst) drains across bounded batches
    *    instead of one giant batch that blows executor memory and the
    *    latency SLA. The bytes cap reads each version's RECORDED
    *    on-disk file bytes from commit stats (no filesystem probes at
    *    admission time); a version containing any pre-byte-stats file
    *    (unknown size) is treated as cap-busting and admits alone —
    *    unknown means assume big, never assume free. At least one
    *    version is always admitted (progress guarantee);
    *    `Trigger.Once`-style ReadAllAvailable requests bypass the caps,
    *    exactly like Delta. */
  final case class ReadOptions(startingVersion: Option[Long] = None,
                               maxVersionsPerTrigger: Option[Int] = None,
                               maxFilesPerTrigger: Option[Int] = None,
                               maxBytesPerTrigger: Option[Long] = None)

  def readOptions(options: CaseInsensitiveStringMap): ReadOptions = {
    def intOpt(key: String): Option[Int] =
      Option(options.get(key)).map(v => v.toIntOption.filter(_ >= 1).getOrElse(
        throw new IllegalArgumentException(
          s"graft-table-changes: $key must be a positive integer, got '$v'")))
    def longOpt(key: String): Option[Long] =
      Option(options.get(key)).map(v => v.toLongOption.filter(_ >= 1).getOrElse(
        throw new IllegalArgumentException(
          s"graft-table-changes: $key must be a positive long, got '$v'")))
    ReadOptions(startingVersion(options),
      intOpt("max_versions_per_trigger"), intOpt("max_files_per_trigger"),
      longOpt("max_bytes_per_trigger"))
  }

  def startingVersion(options: CaseInsensitiveStringMap): Option[Long] =
    Option(options.get("starting_version")).map {
      case "latest" => -1L // resolved against the live log at start
      case v => v.toLongOption.filter(_ >= 0).getOrElse(
        throw new IllegalArgumentException(
          s"graft-table-changes: starting_version must be a version " +
            s"number >= 0 or 'latest', got '$v'"))
    }
}

private[v2] class ChangesStream(root: String, schema: StructType,
                                opts: ChangesStream.ReadOptions)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{ReadAllAvailable, ReadLimit}

  // source-compat shim for the pre-admission-control call shape
  def this(root: String, schema: StructType,
           startingVersion: Option[Long] = None) =
    this(root, schema, ChangesStream.ReadOptions(startingVersion))

  private def spark = SparkSession.active

  override def initialOffset(): Offset = opts.startingVersion match {
    case Some(-1L) => // 'latest': only commits after the stream starts
      VersionOffset(TableFormat.versions(spark, root).lastOption.getOrElse(0L))
    // inclusive (the Delta convention): version n itself is the first
    // emitted commit, so the exclusive low offset is n-1
    case Some(v) => VersionOffset(v - 1)
    case None => VersionOffset(0L)
  }

  override def latestOffset(): Offset = {
    val vs = TableFormat.versions(spark, root)
    VersionOffset(vs.lastOption.getOrElse(0L))
  }

  // ---- Trigger.AvailableNow (SupportsTriggerAvailableNow) ----
  // Implemented DIRECTLY (not via Spark's wrapper) because the wrapper's
  // latestOffset(start, limit) returns the prepared head outright —
  // admission control would be silently ignored and the whole backlog
  // would land in one batch. Owning the interface pins the run's end
  // offset at prepare time AND keeps the per-batch caps: the backlog
  // drains across bounded batches up to the pinned head, exactly
  // Delta's AvailableNow behavior.
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap =
      Some(TableFormat.versions(spark, root).lastOption.getOrElse(0L))

  private def cappedHead(head: Long): Long =
    availableNowCap.fold(head)(math.min(head, _))

  // ---- admission control (SupportsAdmissionControl) ----

  /** Advertise a file cap when EITHER throttle option is set — the
    * concrete ReadLimit object is only a carrier; [[latestOffset(Offset,
    * ReadLimit)]] applies the caps from the parsed options, and treats a
    * ReadAllAvailable request (Trigger.Once) as "bypass the caps". */
  override def getDefaultReadLimit: ReadLimit =
    if (opts.maxVersionsPerTrigger.isEmpty && opts.maxFilesPerTrigger.isEmpty
        && opts.maxBytesPerTrigger.isEmpty)
      ReadLimit.allAvailable()
    else opts.maxBytesPerTrigger match {
      case Some(b) if opts.maxFilesPerTrigger.isEmpty => ReadLimit.maxBytes(b)
      case _ => ReadLimit.maxFiles(opts.maxFilesPerTrigger.getOrElse(Int.MaxValue))
    }

  override def reportLatestOffset(): Offset = latestOffset()

  /** Cap the batch END VERSION so the window `(start, end]` admits at
    * most `max_versions_per_trigger` versions and (approximately) at
    * most `max_files_per_trigger` appended files — the first admitted
    * version is never split (progress guarantee: a single version larger
    * than the file cap still drains alone). Pure driver arithmetic over
    * the already-resolved snapshots, like batch planning itself. */
  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val s = startOffset.asInstanceOf[VersionOffset].version
    val all = TableFormat.versions(spark, root)
    val head = cappedHead(all.lastOption.getOrElse(0L))
    val uncapped = limit.isInstanceOf[ReadAllAvailable] ||
      (opts.maxVersionsPerTrigger.isEmpty && opts.maxFilesPerTrigger.isEmpty
        && opts.maxBytesPerTrigger.isEmpty)
    if (uncapped || head <= s) return VersionOffset(head)
    val maxV = opts.maxVersionsPerTrigger.getOrElse(Int.MaxValue)
    val maxF = opts.maxFilesPerTrigger.getOrElse(Int.MaxValue).toLong
    val maxB = opts.maxBytesPerTrigger.getOrElse(Long.MaxValue)
    val pending = all.filter(v => v > s && v <= head)
    var end = s
    var files = 0L
    var bytes = 0L
    var taken = 0
    val it = pending.iterator
    var stop = false
    // saturating add: an unknown-size version carries the Long.MaxValue
    // sentinel, and the running total must pin there, not wrap
    def satAdd(a: Long, b: Long): Long = {
      val r = a + b; if (r < 0) Long.MaxValue else r
    }
    while (it.hasNext && !stop) {
      val v = it.next()
      if (taken >= maxV) stop = true
      else {
        // appended files of v, the same diff batch planning uses: a
        // replace commit contributes nothing, a base version (no live
        // predecessor) contributes its full file set
        val cur = TableFormat.snapshot(spark, root, Some(v))
        val prev = all.filter(_ < v).lastOption
        val added =
          if (prev.isEmpty) cur.files
          else if (cur.op.contains("replace")) Seq.empty
          else {
            val prevFiles = TableFormat.snapshot(spark, root, prev)
              .files.map(_.file).toSet
            cur.files.filterNot(f => prevFiles(f.file))
          }
        val n = added.size.toLong
        // recorded on-disk bytes; any pre-byte-stats file (-1) makes
        // the version cap-busting under a bytes limit — unknown size
        // admits alone rather than piling into an unbounded batch
        val b =
          if (added.exists(_.bytes < 0)) Long.MaxValue
          else added.map(_.bytes).sum
        if (taken > 0 && (files + n > maxF || satAdd(bytes, b) > maxB))
          stop = true
        else { end = v; files += n; bytes = satAdd(bytes, b); taken += 1 }
      }
    }
    VersionOffset(end)
  }

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].version
    val e = end.asInstanceOf[VersionOffset].version
    if (s >= e) return Array.empty
    // walk only versions that EXIST — a log need not start at 1 (a
    // clone's log continues the source's numbering) and retention may
    // have expired a prefix; the first live version in the window has
    // no predecessor and emits its full file set
    val all = TableFormat.versions(spark, root)
    val window = all.filter(v => v > s && v <= e)
    val snaps = (window ++ window.flatMap(v => all.filter(_ < v).lastOption))
      .distinct.map(v => v -> TableFormat.snapshot(spark, root, Some(v))).toMap
    window.flatMap { v =>
      val cur = snaps(v)
      val prev = all.filter(_ < v).lastOption
      if (prev.isEmpty)
        // no live predecessor (fresh table, clone log, or retention
        // expired the prefix): this version IS the base content — emit
        // its full file set EVEN when op=replace, else a stream started
        // after compaction+expiry would silently never deliver the
        // table's pre-existing rows
        cur.files.map(f => TableFilePartition(f.file, v): InputPartition)
      else if (cur.op.contains("replace")) Seq.empty // content-preserving: skip
      else {
        val prevFiles = snaps(prev.get).files.map(_.file).toSet
        cur.files.map(_.file).filterNot(prevFiles)
          .map(f => TableFilePartition(f, v): InputPartition)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // rename/drop ledger of the live head (the stream reads under the
    // LATEST schema): old-era files resolve their columns through it,
    // by partition version — only the small colmap/colborn subset ships
    val mapping = TableFormat.snapshot(spark, root).props.filter { case (k, _) =>
      k.startsWith("colmap.") || k.startsWith("colborn.")
    }
    new ParquetRowReaderFactory(schema,
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()), mapping)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Serializable carrier for the session's Hadoop configuration — what
  * lets the executor-side parquet readers honor fs.* settings (S3A/ABFS
  * credentials, endpoints) instead of a bare `new Configuration()` that
  * only works on default-configured filesystems. Capture with
  * `spark.sessionState.newHadoopConf()` ON THE DRIVER. */
private[v2] class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

private class ParquetRowReaderFactory(schema: StructType,
                                      conf: SerializableHadoopConf,
                                      mapping: Map[String, String] = Map.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TableFilePartition]
    // a file emitted at version v was written under the names live at
    // v: resolve the requested schema into that era (identity when no
    // ledger; output is positional, synth columns are never mapped)
    val physSchema =
      if (mapping.isEmpty) schema
      else TableFormat.physicalSchemaOf(mapping, schema, p.version)
    new ParquetRowReader(p.file, physSchema, conf.value,
      synth = Map(TableChangesV2.VersionColumn -> p.version))
  }
}

private[v2] object ParquetRowReader {
  /** Drain one long-typed column of a parquet file into a hash set —
    * how a reader task loads the delete manifests that apply to its
    * file (memory O(manifest keys); manifest compaction is the dial
    * that bounds it). */
  def readLongColumn(file: String, column: String,
                     conf: org.apache.hadoop.conf.Configuration)
      : java.util.HashSet[java.lang.Long] = {
    val out = new java.util.HashSet[java.lang.Long]()
    // NEVER let a scan's stamped row-group predicate reach a manifest
    // read: a data-column filter would drop `_del_key` row groups and
    // the emptied mask would resurrect deleted rows
    val c =
      if (GraftRowGroupFilter.hasFilter(conf)) GraftRowGroupFilter.without(conf)
      else conf
    val r = new ParquetRowReader(file,
      StructType(Seq(StructField(column, LongType))), c)
    try while (r.next()) out.add(r.get().getLong(0))
    finally r.close()
    out
  }
}

/** Executor-side parquet → InternalRow reader over the parquet Group
  * API (parquet-column ships with Spark). Columns are resolved BY NAME
  * against the file's own schema — a file written before a column
  * existed yields null for it (the format's evolution contract).
  * `synth` columns (e.g. `_commit_version`) are synthesized per row;
  * `mask`+`keyCol` apply a merge-on-read delete set — masked rows are
  * skipped during the scan, before Spark sees them. */
private[v2] class ParquetRowReader(file: String, schema: StructType,
                                   conf: org.apache.hadoop.conf.Configuration,
                                   synth: Map[String, Any] = Map.empty,
                                   mask: java.util.HashSet[java.lang.Long] = null,
                                   keyCol: String = null,
                                   posMask: org.roaringbitmap.longlong.Roaring64Bitmap = null,
                                   posCol: String = null)
    extends PartitionReader[InternalRow] {
  // `posMask` is a DELETION VECTOR of file-absolute row ordinals, and
  // `posCol` names a schema field synthesized AS the row's ordinal (the
  // `_pos` metadata column delta-based row-level ops anchor on). Both
  // need the sequential ordinal count, so the caller must hand a
  // FILTER-FREE conf with either (the factories do): a stamped
  // row-group predicate would skip groups and desynchronize it.
  require((posMask == null && posCol == null) ||
    !GraftRowGroupFilter.hasFilter(conf),
    s"parquet-row-reader: file-absolute ordinals need an unfiltered read of $file")
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
  import org.apache.parquet.hadoop.ParquetFileReader
  import org.apache.parquet.hadoop.util.HadoopInputFile
  import org.apache.parquet.io.ColumnIOFactory

  // open through HadoopReadOptions so a row-group FilterPredicate the
  // scan stamped on the conf applies at open (stats-level skipping of
  // non-matching row groups — the masked MoR path gets the same IO
  // savings as the vectorized path); a foreign file whose physical type
  // rejects the typed predicate falls back to an unfiltered open
  private val reader = {
    val path = new org.apache.hadoop.fs.Path(file)
    def open(c: org.apache.hadoop.conf.Configuration) =
      ParquetFileReader.open(HadoopInputFile.fromPath(path, c),
        org.apache.parquet.HadoopReadOptions.builder(c, path).build())
    try open(conf)
    catch {
      case _: IllegalArgumentException if GraftRowGroupFilter.hasFilter(conf) =>
        open(GraftRowGroupFilter.without(conf))
    }
  }
  private val fileSchema = reader.getFooter.getFileMetaData.getSchema
  private val columnIO = new ColumnIOFactory().getColumnIO(fileSchema)

  /** Leaf converter resolved ONCE per field against the file's own
    * parquet type (not per row), reading repetition `idx` of `name` in
    * its parent group (idx > 0 only for legacy 2-level repeated leafs):
    * primitives map directly; DATE is the parquet INT32 day count
    * (= Spark's internal representation); TIMESTAMP handles INT64
    * MILLIS/MICROS/NANOS and legacy INT96 (julian day + nanos-of-day),
    * normalized to Spark's micros; DECIMAL handles the INT32/INT64/
    * binary physical encodings at the declared scale. */
  private def leafConverter(prim: org.apache.parquet.schema.PrimitiveType,
                            name: String, dt: DataType): (Group, Int) => Any = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    dt match {
      // type-widened columns read files written BEFORE the widen: the
      // converter resolves against the file's own physical type, so an
      // INT32-era file up-converts under a BIGINT schema (FLOAT under
      // DOUBLE) — the read half of safe widening
      case LongType => prim.getPrimitiveTypeName match {
        case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32 =>
          (g, i) => g.getInteger(name, i).toLong
        case _ => (g, i) => g.getLong(name, i)
      }
      case IntegerType => (g, i) => g.getInteger(name, i)
      case DoubleType => prim.getPrimitiveTypeName match {
        case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.FLOAT =>
          (g, i) => g.getFloat(name, i).toDouble
        case _ => (g, i) => g.getDouble(name, i)
      }
      case FloatType => (g, i) => g.getFloat(name, i)
      case BooleanType => (g, i) => g.getBoolean(name, i)
      case StringType => (g, i) => UTF8String.fromString(g.getString(name, i))
      case BinaryType => (g, i) => g.getBinary(name, i).getBytes
      case DateType => (g, i) => g.getInteger(name, i) // INT32 days since epoch
      case TimestampType => prim.getPrimitiveTypeName match {
        case PrimitiveTypeName.INT96 => (g, i) => {
          // legacy INT96: 8 bytes little-endian nanos-of-day + 4 bytes
          // little-endian julian day (2440588 = 1970-01-01)
          val bb = g.getInt96(name, i).toByteBuffer
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val nanosOfDay = bb.getLong; val julianDay = bb.getInt
          (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
        }
        case PrimitiveTypeName.INT64 =>
          val unit = prim.getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit
            case _ => LogicalTypeAnnotation.TimeUnit.MICROS
          }
          unit match {
            case LogicalTypeAnnotation.TimeUnit.MILLIS =>
              (g, i) => g.getLong(name, i) * 1000L
            case LogicalTypeAnnotation.TimeUnit.NANOS =>
              (g, i) => g.getLong(name, i) / 1000L
            case _ => (g, i) => g.getLong(name, i) // micros: Spark's own unit
          }
        case t => throw new UnsupportedOperationException(
          s"parquet-row-reader: timestamp column $name stored as $t")
      }
      case d: DecimalType => prim.getPrimitiveTypeName match {
        case PrimitiveTypeName.INT32 =>
          (g, i) => Decimal(g.getInteger(name, i).toLong, d.precision, d.scale)
        case PrimitiveTypeName.INT64 =>
          (g, i) => Decimal(g.getLong(name, i), d.precision, d.scale)
        case PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY | PrimitiveTypeName.BINARY =>
          (g, i) => {
            val unscaled = new java.math.BigInteger(g.getBinary(name, i).getBytes)
            Decimal(BigDecimal(new java.math.BigDecimal(unscaled, d.scale)),
              d.precision, d.scale)
          }
        case t => throw new UnsupportedOperationException(
          s"parquet-row-reader: decimal column $name stored as $t")
      }
      case dt => throw new UnsupportedOperationException(
        s"parquet-row-reader: unsupported leaf type ${dt.simpleString} " +
          s"for column $name (supported: long/int/double/float/string/" +
          "boolean/date/timestamp/decimal/binary, ARRAY, STRUCT, MAP)")
    }
  }

  /** Extractor for `f` inside a group of parquet type `gt` — the
    * recursive spine that makes NESTED columns (struct groups, LIST
    * arrays, arrays of structs) first-class through the custom reader:
    *   - a field the file lacks reads as null at EVERY level (the same
    *     add-only evolution contract as flat columns — a struct widened
    *     with a new member back-fills it inside old rows);
    *   - STRUCT maps to its parquet group, each member resolved by name;
    *   - ARRAY handles the standard 3-level LIST encoding (`repeated
    *     group list { optional element }` — what Spark and the catalog
    *     writer emit), plus the legacy 2-level repeated-leaf and
    *     repeated-struct forms, detected from the file's own schema the
    *     way Spark's ParquetSchemaConverter does. */
  private def fieldExtractor(gt: org.apache.parquet.schema.GroupType,
                             f: StructField): Group => Any = {
    val name = f.name
    if (!gt.containsField(name)) return (_: Group) => null
    val ftype = gt.getType(gt.getFieldIndex(name))
    f.dataType match {
      case st: StructType =>
        val sub = ftype.asGroupType()
        val members = st.fields.map(sf => fieldExtractor(sub, sf))
        g => if (g.getFieldRepetitionCount(name) == 0) null
          else {
            val sg = g.getGroup(name, 0)
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              members.map(_(sg)): Array[Any])
          }
      case ArrayType(et, _) =>
        val lst = ftype.asGroupType()
        require(lst.getFieldCount == 1,
          s"parquet-row-reader: list group $name has ${lst.getFieldCount} fields")
        val repName = lst.getFieldName(0)
        val repType = lst.getType(0)
        // element read strategy, decided once from the FILE's encoding
        val readElem: (Group, Int) => Any =
          if (repType.isPrimitive) {
            // legacy 2-level: repeated leaf directly under the list group
            val conv = leafConverter(repType.asPrimitiveType(), repName, et)
            (lg, j) => conv(lg, j)
          } else {
            val repGroup = repType.asGroupType()
            // parquet's documented LIST backward-compat rule (mirrored by
            // Spark's ParquetSchemaConverter.isElementType): the repeated
            // group IS the element when it has multiple fields, or is
            // named "array", or carries the list group's name + "_tuple"
            // (legacy Avro/Thrift writers); ONLY otherwise is it the
            // standard 3-level element holder. Keying off the inner
            // field being named "element" would misparse a legacy
            // 2-level struct element that happens to have a single
            // member called "element".
            val isElementHolder = !(repGroup.getFieldCount > 1 ||
              repName == "array" || repName == s"${name}_tuple")
            if (isElementHolder) {
              // standard 3-level: repeated holder wraps one optional element
              val elemField = StructField(repGroup.getFieldName(0), et)
              val conv = fieldExtractor(repGroup, elemField)
              (lg, j) => conv(lg.getGroup(repName, j))
            } else {
              // legacy 2-level repeated STRUCT: the repeated group IS the element
              val est = et match {
                case s: StructType => s
                case other => throw new UnsupportedOperationException(
                  s"parquet-row-reader: repeated group $repName read as " +
                    s"${other.simpleString}")
              }
              val members = est.fields.map(sf => fieldExtractor(repGroup, sf))
              (lg, j) => {
                val eg = lg.getGroup(repName, j)
                new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
                  members.map(_(eg)): Array[Any])
              }
            }
          }
        g => if (g.getFieldRepetitionCount(name) == 0) null
          else {
            val lg = g.getGroup(name, 0)
            val n = lg.getFieldRepetitionCount(repName)
            val out = new Array[Any](n)
            var j = 0
            while (j < n) { out(j) = readElem(lg, j); j += 1 }
            new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
          }
      case MapType(kt, vt, _) =>
        // standard MAP encoding: repeated key_value group of (key, value)
        // — the repeated-group name is taken from the file ("key_value",
        // legacy "map")
        val mapG = ftype.asGroupType()
        require(mapG.getFieldCount == 1,
          s"parquet-row-reader: map group $name has ${mapG.getFieldCount} fields")
        val repName = mapG.getFieldName(0)
        val kvType = mapG.getType(0).asGroupType()
        val keyConv = fieldExtractor(kvType,
          StructField(kvType.getFieldName(0), kt))
        val valConv = fieldExtractor(kvType,
          StructField(kvType.getFieldName(1), vt))
        g => if (g.getFieldRepetitionCount(name) == 0) null
          else {
            val mg = g.getGroup(name, 0)
            val n = mg.getFieldRepetitionCount(repName)
            val keys = new Array[Any](n)
            val vals = new Array[Any](n)
            var j = 0
            while (j < n) {
              val kv = mg.getGroup(repName, j)
              keys(j) = keyConv(kv)
              vals(j) = valConv(kv)
              j += 1
            }
            new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
              new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
              new org.apache.spark.sql.catalyst.util.GenericArrayData(vals))
          }
      case _ =>
        val conv = leafConverter(ftype.asPrimitiveType(), name, f.dataType)
        g => if (g.getFieldRepetitionCount(name) == 0) null else conv(g, 0)
    }
  }

  // per-field extractors resolved once: synth columns, schema-evolution
  // nulls for fields the file predates, and typed (nested) conversion
  private val extractors: Array[Group => Any] = schema.fields.map { f =>
    if (synth.contains(f.name)) { val v = synth(f.name); (_: Group) => v }
    else fieldExtractor(fileSchema, f)
  }
  // schema slot synthesized per row as the file-absolute ordinal
  private val posIdx: Int =
    if (posCol == null) -1 else schema.fieldIndex(posCol)

  private var recordReader: org.apache.parquet.io.RecordReader[Group] = _
  private var rowsLeftInGroup = 0L
  private var current: InternalRow = _

  private def advanceRowGroup(): Boolean = {
    val pages = reader.readNextRowGroup()
    if (pages == null) false
    else {
      recordReader = columnIO.getRecordReader(pages,
        new GroupRecordConverter(fileSchema))
      rowsLeftInGroup = pages.getRowCount
      if (rowsLeftInGroup == 0) advanceRowGroup() else true
    }
  }

  /** The row's key for mask probing, or null for a NULL key — delete
    * manifests never hold nulls (the writers filter them), so a
    * null-key row is never masked (and must not NPE the scan). */
  private def keyOf(g: Group): java.lang.Long =
    if (g.getFieldRepetitionCount(keyCol) == 0) null
    else fileSchema.getType(fileSchema.getFieldIndex(keyCol))
      .asPrimitiveType().getPrimitiveTypeName match {
      case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64 =>
        g.getLong(keyCol, 0)
      case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32 =>
        g.getInteger(keyCol, 0).toLong
      case t => throw new UnsupportedOperationException(
        s"parquet-row-reader: non-integral key column $keyCol ($t)")
    }

  // file-absolute row ordinal of the NEXT record (valid because a
  // posMask read never skips row groups — see the constructor guard)
  private var pos = -1L

  override def next(): Boolean = {
    while (true) {
      if (rowsLeftInGroup == 0 && !advanceRowGroup()) return false
      val g = recordReader.read()
      rowsLeftInGroup -= 1
      pos += 1
      if ((posMask == null || !posMask.contains(pos)) &&
          (mask == null || { val k = keyOf(g); k == null || !mask.contains(k) })) {
        val vals = new Array[Any](extractors.length)
        var i = 0
        while (i < extractors.length) { vals(i) = extractors(i)(g); i += 1 }
        if (posIdx >= 0) vals(posIdx) = pos
        current = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
