package graft.sources.v2

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.TableFormat

/** PATH-BASED DataSourceV2 over a [[TableFormat]] table — the
  * `format("delta").load(path)` shape, for sessions that don't mount
  * the catalog:
  *
  * {{{
  *   spark.read.format("graft-table").load(root)          // latest snapshot
  *   df.writeStream.format("graft-table")                  // REAL streaming
  *     .option("path", root)                               //   sink: one
  *     .option("lineage", checkpointDir)                   //   commit per
  *     .start()                                            //   micro-batch
  * }}}
  *
  * Reads share the catalog's scan machinery verbatim (column pruning,
  * zone-stat file pruning, in-task merge-on-read masks, the vectorized
  * ColumnarBatch path on clean snapshots). Batch writes are the
  * catalog's append path. The STREAMING sink is the DSv2 twin of
  * [[graft.streaming.Streams.foreachBatchTableAppend]], with the same
  * in-log exactly-once gate: each epoch lands as ONE append commit
  * carrying `batch_id`/`lineage` in the commit props, so a replayed
  * epoch (at-least-once delivery, restart re-execution) commits
  * NOTHING — no side-channel state, the discipline every sink in this
  * engine follows.
  *
  * The table must already exist ([[TableFormat.createEmpty]], SQL
  * `CREATE TABLE graft...`, or any bootstrap commit): the log is where
  * key/bloom geometry and the schema live, and a sink that silently
  * invented them on first write would hide exactly the declarations
  * that matter at 100 TB. */
class GraftTableV2 extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-table"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val root = TableChangesV2.rootOf(options)
    val spark = SparkSession.active
    require(TableFormat.versions(spark, root).nonEmpty,
      s"graft-table: no table at $root — bootstrap it first " +
        "(TableFormat.createEmpty / CREATE TABLE through the catalog)")
    val snap = TableFormat.snapshot(spark, root)
    StructType.fromDDL(snap.schemaDdl.getOrElse(throw new IllegalArgumentException(
      s"graft-table: table at $root carries no committed schema")))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new PathGraftTable(TableChangesV2.rootOf(
      new CaseInsensitiveStringMap(properties)), schema)
}

private class PathGraftTable(root: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-table($root)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER, TableCapability.OVERWRITE_DYNAMIC,
      TableCapability.STREAMING_WRITE, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val snap = TableFormat.snapshot(SparkSession.active, root)
    new GraftSqlScanBuilder(snap, tableSchema)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val snap = TableFormat.snapshot(SparkSession.active, root)
    new GraftSqlWriteBuilder(root, info.schema(), info.queryId(),
      snap.props.get(TableFormat.PartitionSpecProp),
      lineage = Option(info.options.get("lineage")).getOrElse(""),
      targetFileBytes = GraftSqlWrite.targetOf(snap.props),
      sortOrder = GraftSqlWrite.sortOrderOf(snap.props))
  }
}
