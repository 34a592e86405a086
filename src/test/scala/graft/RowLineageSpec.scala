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
    // MoR update masks 3 rows; since round 15 the replacement rows KEEP
    // the pre-image's id (Iceberg v3's rule: an update modifies a row,
    // it does not create one) — the pre-image _row_id rides the update
    // op's metadata projection into the appended batch's id column
    spark.sql("UPDATE rlcat.rm SET v = -1 WHERE k IN (7, 107, 207)")
    val afterUpd = idsByKey("rm")
    assert(afterUpd == before, "MoR update moved ids")
    assert(spark.sql("SELECT sum(v) FROM rlcat.rm WHERE k IN (7,107,207)")
      .collect()(0).getLong(0) == -3L)
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

  test("a MoR MERGE keeps unmatched AND matched rows' ids (matched " +
      "updates carry the pre-image id); only true inserts draw fresh ones") {
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
    (0L until 50L).foreach(k =>
      assert(after(k) == before(k), s"k=$k moved by MoR merge"))
    (50L until 60L).foreach(k => assert(after(k) >= 50L, s"k=$k id ${after(k)}"))
    assert(after.values.toSeq.distinct.size == 60, "ids must stay unique")
    // the updated rows' post-images really are the new values
    assert(spark.sql("SELECT sum(v) FROM rlcat.rg WHERE k >= 40 AND k < 60")
      .collect()(0).getLong(0) == (40L until 60L).map(_ * 100).sum)
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

  test("lineage rewrites survive a warehouse path needing URI encoding: " +
      "the rid lookup normalizes both path forms and fails fast") {
    // a SPACE in the warehouse path makes the reader's _metadata.file_path
    // rendering percent-encoded — the regression the round-14 advisor
    // caught: a regexp-stripped (still-encoded) join key against the
    // decoded lookup key dropped EVERY row, and compact committed the
    // truncated result as op=replace (silent data loss). Both sides now
    // normalize through the same uriPath function, and an unresolved
    // path raises instead of truncating.
    val wh = java.nio.file.Files
      .createTempDirectory("graft lineage sp").toString
    spark.conf.set("spark.sql.catalog.rlsp",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.rlsp.warehouse", wh)
    spark.sql("""CREATE TABLE rlsp.rs (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k')""")
    spark.sql("INSERT INTO rlsp.rs SELECT id, id FROM range(60) ORDER BY id")
    spark.sql("INSERT INTO rlsp.rs SELECT id, id FROM range(60, 90) ORDER BY id")
    val before = spark.sql("SELECT k, _row_id FROM rlsp.rs").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before.size == 90 && before.values.toSeq.distinct.size == 90)
    spark.sql("CALL rlsp.system.compact('rs', 2)")
    val after = spark.sql("SELECT k, _row_id FROM rlsp.rs").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == before,
      s"ids changed or rows lost across a space-path compact: " +
        s"${after.size} rows vs ${before.size}")
  }

  test("copy-on-write DML PRESERVES surviving rows' ids (Iceberg v3): " +
      "SQL UPDATE keeps every id — including the updated row's — and " +
      "a CoW DELETE retires only the deleted ids") {
    warehouse
    spark.sql("""CREATE TABLE rlcat.rc (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k')""")
    // two files (two inserts): only one group is touched
    spark.sql("INSERT INTO rlcat.rc SELECT id, id FROM range(50) ORDER BY id")
    spark.sql("INSERT INTO rlcat.rc SELECT id, id FROM range(50, 100) ORDER BY id")
    val before = idsByKey("rc")
    spark.sql("UPDATE rlcat.rc SET v = -1 WHERE k = 75") // CoW: group rewrite
    val after = idsByKey("rc")
    // round 15: the rewrite reads _row_id as a required metadata
    // attribute and persists it as the materialized id column, so the
    // rewritten group's SURVIVORS — and the updated row itself (an
    // update modifies a row, it does not create one) — keep their ids
    assert(after == before,
      s"CoW UPDATE moved ids: ${after.toSeq.diff(before.toSeq).take(5)}")
    // the rewritten file carries the materialized column
    val snapU = TableFormat.snapshot(spark, s"$warehouse/rc")
    assert(snapU.files.exists(_.ridCol), "rewritten group lost ridCol")
    assert(spark.sql("SELECT v FROM rlcat.rc WHERE k = 75")
      .collect()(0).getLong(0) == -1L)
    // CoW DELETE through the same path: survivors keep ids, the deleted
    // key's id disappears and is never reused
    spark.sql("DELETE FROM rlcat.rc WHERE k IN (10, 75)")
    val afterDel = idsByKey("rc")
    assert(afterDel == before - 10L - 75L,
      "CoW DELETE moved surviving ids")
    // library-level CoW MERGE (mergeRows): matched rows keep their ids,
    // true inserts draw fresh ones from the counter
    val root = s"$warehouse/rc"
    import spark.implicits._
    TableFormat.mergeRows(spark, root, s"$root/data",
      Seq((20L, -2L), (200L, -3L)).toDF("k", "v"))
    val afterMerge = idsByKey("rc")
    assert(afterMerge(20L) == before(20L), "CoW MERGE moved the matched row's id")
    assert(afterMerge(200L) >= 100L, "insert must draw a fresh id")
    assert((afterMerge - 20L - 200L) == (afterDel - 20L),
      "CoW MERGE moved unmatched survivors' ids")
    // targeted deleteKeys (bloom-pruned CoW): survivors keep ids too
    TableFormat.deleteKeys(spark, root, s"$root/data", Seq(30L))
    val afterDk = idsByKey("rc")
    assert(afterDk == afterMerge - 30L, "deleteKeys moved surviving ids")
    assert(afterDk.values.toSeq.distinct.size == afterDk.size)
  }
}
