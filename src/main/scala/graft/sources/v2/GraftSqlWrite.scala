package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

import graft.operators.TableFormat

/** SQL WRITE PATH for the graft catalog — what turns `CREATE TABLE ...
  * AS SELECT` and `INSERT INTO/OVERWRITE graft.t` into [[TableFormat]]
  * commits (the Delta/Iceberg DSv2 write shape; reference analog: the
  * whole reference is a load pipeline, `v3:1096-1100,1330-1333`).
  *
  * Split of responsibilities, chosen for the 1000-executor posture:
  *
  *  - executors stream their partition's rows straight into one parquet
  *    file each under `<root>/data/` (no buffering of the batch, no
  *    driver involvement — a 1000-partition INSERT writes 1000 files in
  *    parallel);
  *  - the DRIVER alone commits: [[TableFormat.appendFiles]] (or
  *    [[TableFormat.overwriteFiles]] when the builder was truncated)
  *    computes per-file stats with one distributed aggregate, enforces
  *    CHECK constraints (a violating INSERT is REFUSED — the files never
  *    enter a commit and the retention sweep's grace logic collects
  *    them), evolves the schema add-only, and publishes via the CAS
  *    rename, so SQL writers serialize with library writers, streaming
  *    sinks and maintenance exactly like any other committer.
  *
  * Files are written with explicit logical types (DATE, TIMESTAMP-micros,
  * DECIMAL-int64) so the catalog's own row reader, the streaming source
  * and Spark's vectorized scan all read them back identically. */
private[v2] class GraftSqlWriteBuilder(root: String, schema: StructType,
                                       queryId: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftSqlBatchWrite(root, schema, queryId, doTruncate)
  }
}

private case class GraftSqlWriteMessage(file: String, nRows: Long)
  extends WriterCommitMessage

private class GraftSqlBatchWrite(root: String, schema: StructType,
                                 queryId: String, truncate: Boolean)
    extends BatchWrite {

  // one data dir per write attempt: abort can sweep it wholesale, and a
  // re-attempted query never collides with its own earlier files
  private val dataDir =
    s"$root/data/sql-$queryId-${java.util.UUID.randomUUID().toString}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftSqlWriterFactory(dataDir, schema, new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf()))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val files = messages.collect {
      case GraftSqlWriteMessage(f, n) if n > 0 => f
    }.toSeq.sorted
    if (truncate) TableFormat.overwriteFiles(spark, root, files)
    else if (files.nonEmpty) TableFormat.appendFiles(spark, root, files)
    // plain INSERT of zero rows: nothing to commit, the table is unchanged
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val p = new org.apache.hadoop.fs.Path(dataDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }
}

private class GraftSqlWriterFactory(dataDir: String, schema: StructType,
                                    conf: SerializableHadoopConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftSqlDataWriter(
      s"$dataDir/part-$partitionId-$taskId.parquet", schema, conf.value)
}

/** Executor-side InternalRow → parquet writer over the parquet example
  * Group API (the mirror of [[ParquetRowReader]]). The file is created
  * lazily on the first row, so empty partitions contribute nothing to
  * the commit. */
private class GraftSqlDataWriter(file: String, schema: StructType,
                                 conf: org.apache.hadoop.conf.Configuration)
    extends DataWriter[InternalRow] {
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.example.data.simple.SimpleGroupFactory
  import org.apache.parquet.hadoop.ParquetWriter
  import org.apache.parquet.hadoop.example.ExampleParquetWriter
  import org.apache.parquet.hadoop.metadata.CompressionCodecName
  import org.apache.parquet.hadoop.util.HadoopOutputFile
  import org.apache.parquet.io.api.Binary
  import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Type, Types => PTypes}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

  private val msgType: MessageType = {
    val b = PTypes.buildMessage()
    schema.fields.foreach { f =>
      val rep =
        if (f.nullable) Type.Repetition.OPTIONAL else Type.Repetition.REQUIRED
      val t = f.dataType match {
        case LongType => PTypes.primitive(INT64, rep)
        case IntegerType => PTypes.primitive(INT32, rep)
        case DoubleType => PTypes.primitive(DOUBLE, rep)
        case FloatType => PTypes.primitive(FLOAT, rep)
        case BooleanType => PTypes.primitive(BOOLEAN, rep)
        case StringType => PTypes.primitive(BINARY, rep)
          .as(LogicalTypeAnnotation.stringType())
        case DateType => PTypes.primitive(INT32, rep)
          .as(LogicalTypeAnnotation.dateType())
        case TimestampType => PTypes.primitive(INT64, rep)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case d: DecimalType if d.precision <= 18 => PTypes.primitive(INT64, rep)
          .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision))
        case dt => throw new UnsupportedOperationException(
          s"graft SQL write: unsupported column type ${dt.simpleString} " +
            s"for ${f.name} (supported: long/int/double/float/string/" +
            "boolean/date/timestamp/decimal(<=18))")
      }
      b.addField(t.named(f.name))
    }
    b.named("graft_sql_write")
  }

  // per-field appenders resolved once, not per row
  private val appenders: Array[(Group, InternalRow, Int) => Unit] =
    schema.fields.map { f =>
      val name = f.name
      f.dataType match {
        case LongType => (g, r, i) => g.add(name, r.getLong(i))
        case IntegerType => (g, r, i) => g.add(name, r.getInt(i))
        case DoubleType => (g, r, i) => g.add(name, r.getDouble(i))
        case FloatType => (g, r, i) => g.add(name, r.getFloat(i))
        case BooleanType => (g, r, i) => g.add(name, r.getBoolean(i))
        case StringType => (g, r, i) =>
          g.add(name, Binary.fromString(r.getUTF8String(i).toString))
        case DateType => (g, r, i) => g.add(name, r.getInt(i))
        case TimestampType => (g, r, i) => g.add(name, r.getLong(i))
        case d: DecimalType => (g, r, i) =>
          g.add(name, r.getDecimal(i, d.precision, d.scale).toUnscaledLong)
        case dt => throw new UnsupportedOperationException(dt.simpleString)
      }
    }

  private val factory = new SimpleGroupFactory(msgType)
  private var writer: ParquetWriter[Group] = _
  private var nRows = 0L

  override def write(row: InternalRow): Unit = {
    if (writer == null)
      writer = ExampleParquetWriter.builder(HadoopOutputFile.fromPath(
          new org.apache.hadoop.fs.Path(file), conf))
        .withConf(conf)
        .withType(msgType)
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .build()
    val g = factory.newGroup()
    var i = 0
    while (i < appenders.length) {
      if (!row.isNullAt(i)) appenders(i)(g, row, i)
      i += 1
    }
    writer.write(g)
    nRows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    GraftSqlWriteMessage(if (nRows > 0) file else null, nRows)
  }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    val p = new org.apache.hadoop.fs.Path(file)
    p.getFileSystem(conf).delete(p, false)
  }

  override def close(): Unit = ()
}
