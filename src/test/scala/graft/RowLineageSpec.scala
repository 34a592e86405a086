package graft

import org.apache.spark.sql.functions._

import graft.operators.TableFormat

/** ROW LINEAGE (the Iceberg v3 `_row_id` shape): every commit assigns
  * the files it adds consecutive id ranges from the table's lineage
  * counter; a row's `_row_id` is its materialized `__graft_row_id`
  * column value (lineage-preserving maintenance rewrites) or
  * `rid + file-absolute ordinal`. Stability contract: ids survive
  * compaction, materialization and recluster; merge-on-read updates
  * keep untouched rows' ids (replacements are new rows = new ids);
  * copy-on-write DML reassigns ids in the groups it rewrites (stated —
  * use MoR mode when lineage matters). */
class RowLineageSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_lineage").toString
    spark.conf.set("spark.sql.catalog.rlcat",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.rlcat.warehouse", wh)
    wh
  }

  private def idsByKey(t: String): Map[Long, Long] =
    spark.sql(s"SELECT k, _row_id FROM rlcat.$t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("ids assign at first commit in file order and later inserts " +
      "continue the counter; the plan stays columnar") {
    warehouse
    spark.sql("""CREATE TABLE rlcat.ra (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k')""")
    spark.sql("""INSERT INTO rlcat.ra
      SELECT id AS k, id * 2 AS v FROM range(100) ORDER BY k""")
    val q = spark.sql("SELECT _row_id, k FROM rlcat.ra ORDER BY k")
    // served by the columnar scan (the RowIdVector synthesis)
    assert(q.queryExecution.executedPlan.toString.contains("Columnar: true"))
    // sorted ranged files: ids are exactly the insertion ranks
    assert(q.collect().map(_.getLong(0)).toSeq == (0L until 100L))
    spark.sql("""INSERT INTO rlcat.ra
      SELECT id AS k, id * 2 AS v FROM range(100, 150) ORDER BY k""")
    val ids = idsByKey("ra")
    assert((100L until 150L).map(ids).sorted.toSeq == (100L until 150L))
    val snap = TableFormat.snapshot(spark, s"$warehouse/ra")
    assert(snap.props(TableFormat.NextRowIdProp).toLong == 150L)
    assert(snap.files.forall(_.rid >= 0))
  }

  test("lineage survives the maintenance chain: small-file compaction, " +
      "DV materialization, full compact and recluster all keep ids") {
    warehouse
    spark.sql("""CREATE TABLE rlcat.rm (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k', 'write.update.mode'='merge-on-read')""")
    (0 until 3).foreach(i => spark.sql(
      s"INSERT INTO rlcat.rm SELECT id AS k, id AS v " +
        s"FROM range(${100 * i}, ${100 * (i + 1)}) ORDER BY k"))
    val before = idsByKey("rm")
    assert(before.size == 300)
    val root = s"$warehouse/rm"
    // MoR update masks 3 rows and appends replacements with FRESH ids
    spark.sql("UPDATE rlcat.rm SET v = -1 WHERE k IN (7, 107, 207)")
    val afterUpd = idsByKey("rm")
    Seq(7L, 107L, 207L).foreach(k => assert(afterUpd(k) >= 300, afterUpd(k)))
    (before.keySet -- Set(7L, 107L, 207L)).foreach(k =>
      assert(afterUpd(k) == before(k), s"k=$k moved by MoR update"))
    // materialize the vectors: per-file rewrites carry ids in the column
    spark.sql("CALL rlcat.system.materialize_deletes('rm')")
    assert(idsByKey("rm") == afterUpd, "materialization moved ids")
    assert(TableFormat.snapshot(spark, root).files.exists(_.ridCol))
    // bin-pack the small-file tail
    spark.sql("CALL rlcat.system.compact_small_files('rm', 100000000)")
    assert(idsByKey("rm") == afterUpd, "bin-packing moved ids")
    // full compact (range repartition scatters rows across files)
    spark.sql("CALL rlcat.system.compact('rm', 2)")
    assert(idsByKey("rm") == afterUpd, "compaction moved ids")
    // recluster by a derived group
    spark.sql("CALL rlcat.system.recluster('rm', 'pmod(k, 4)', '')")
    assert(idsByKey("rm") == afterUpd, "recluster moved ids")
    // time travel: the ORIGINAL ids at the pre-update version
    assert(spark.sql(
      "SELECT _row_id FROM rlcat.rm VERSION AS OF 4 WHERE k = 7")
      .collect()(0).getLong(0) == before(7L))
  }

  test("a MoR MERGE keeps unmatched rows' ids; inserts and replacements " +
      "get fresh ones; the changelog pairs carry distinct ids") {
    warehouse
    spark.sql("""CREATE TABLE rlcat.rg (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k', 'write.merge.mode'='merge-on-read')""")
    spark.sql("INSERT INTO rlcat.rg SELECT id, id FROM range(50) ORDER BY id")
    val before = idsByKey("rg")
    spark.sql("SELECT id AS k, id * 100 AS v FROM range(40, 60)")
      .createOrReplaceTempView("rg_stage")
    spark.sql("""MERGE INTO rlcat.rg t USING rg_stage s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val after = idsByKey("rg")
    (0L until 40L).foreach(k => assert(after(k) == before(k)))
    (40L until 60L).foreach(k => assert(after(k) >= 50L))
    assert(after.values.toSeq.distinct.size == 60, "ids must stay unique")
  }

  test("reserved column names refuse at CREATE, ADD COLUMN and RENAME") {
    warehouse
    Seq("_file", "_pos", "_row_id", "__graft_row_id").foreach { c =>
      val e = intercept[Exception](spark.sql(
        s"CREATE TABLE rlcat.bad_${c.replace("_", "u")} " +
          s"(k BIGINT, `$c` BIGINT) TBLPROPERTIES('key_col'='k')"))
      assert(e.getMessage.contains("reserved"), s"$c: ${e.getMessage}")
    }
    spark.sql("CREATE TABLE rlcat.rv (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES('key_col'='k')")
    val e1 = intercept[Exception](spark.sql(
      "ALTER TABLE rlcat.rv ADD COLUMN _row_id BIGINT"))
    assert(e1.getMessage.contains("reserved"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE rlcat.rv RENAME COLUMN v TO __graft_row_id"))
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
  }

  test("copy-on-write DML reassigns ids in rewritten groups (stated); " +
      "untouched files keep theirs") {
    warehouse
    spark.sql("""CREATE TABLE rlcat.rc (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k')""")
    // two files (two inserts): only one group is touched
    spark.sql("INSERT INTO rlcat.rc SELECT id, id FROM range(50) ORDER BY id")
    spark.sql("INSERT INTO rlcat.rc SELECT id, id FROM range(50, 100) ORDER BY id")
    val before = idsByKey("rc")
    spark.sql("UPDATE rlcat.rc SET v = -1 WHERE k = 75") // CoW: group rewrite
    val after = idsByKey("rc")
    // the runtime group filter narrowed the rewrite to the ONE file
    // holding k=75: every other file keeps its ids by reference, the
    // rewritten group's rows re-id from the counter (copy-on-write
    // semantics, stated)
    val moved = after.keySet.filter(k => after(k) != before(k))
    assert(moved.contains(75L), moved)
    assert(moved.forall(k => after(k) >= 100L), moved.map(after))
    val keptFiles = TableFormat.snapshot(spark, s"$warehouse/rc")
      .files.filter(_.seq < 4)
    assert(moved.size == 100 - keptFiles.map(_.nRows).sum, moved.size)
    assert(after.values.toSeq.distinct.size == 100)
  }
}
