package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) joins — the layout answer to a repeated
  * large-large join. Broadcasting covers dim joins and salting covers skew,
  * but when BOTH sides are data-scale and the join recurs (the reference's
  * transactions×splits shape at 100 TB), the winning move is to pay the
  * shuffle once at write time: bucket both tables by the join key into the
  * same bucket count, and every subsequent join is a sort-merge with NO
  * exchange on either side — the scan itself delivers co-partitioned,
  * pre-sorted input.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table in the
    * session catalog. One shuffle now; none on any future join by `key`.
    * Drops any prior table AND its warehouse location first — an orphaned
    * location from an earlier session (in-memory catalog, on-disk files)
    * otherwise blocks the managed-table create. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    require(!table.contains("."),
      s"writeBucketed takes a simple table name in the current database, got $table")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // resolve the managed location through the catalog (not by string
    // concatenation) so non-default databases clean the right directory
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(
      table, Some(spark.catalog.currentDatabase))
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Inner join of two same-bucketed tables on their bucket key. With equal
    * bucket counts the plan is exchange-free (verify with
    * `.explain`: SortMergeJoin directly over the two scans). */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
