package graft

import org.apache.spark.sql.functions._

import graft.operators.TableFormat

/** SQL MATERIALIZED VIEWS with incremental refresh: CALL
  * create_materialized_view stores the aggregate + a source-version
  * cursor; CALL refresh_mv consumes the changelog (all three delete
  * shapes + the CDF paired-update shape) as signed deltas — the fact
  * table is never re-scanned; refresh always equals the full
  * recompute. */
class MaterializedViewSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_mv").toString
    spark.conf.set("spark.sql.catalog.mvcat",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.mvcat.warehouse", wh)
    wh
  }

  private def recompute(sql: String): Seq[Row] =
    spark.sql(sql).collect().toSeq.sortBy(_.toString)
  private type Row = org.apache.spark.sql.Row
  private def mvRows(mv: String): Seq[Row] =
    spark.sql(s"SELECT * FROM mvcat.$mv").collect().toSeq.sortBy(_.toString)

  test("bootstrap equals the full compute; refresh over append, MoR " +
      "merge, DV delete, manifest delete, CoW delete and compaction " +
      "equals the recompute; a converged refresh commits nothing") {
    warehouse
    spark.sql("""CREATE TABLE mvcat.fact (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k',
        'write.merge.mode'='merge-on-read',
        'write.update.mode'='merge-on-read',
        'write.delete.mode'='merge-on-read')""")
    spark.sql("""INSERT INTO mvcat.fact
      SELECT id AS k, CASE WHEN id % 11 = 3 THEN NULL ELSE id * 10 END AS v
      FROM range(300) ORDER BY id""")
    val defSql =
      "SELECT k % 5 AS grp, count(*) AS n, sum(v) AS total, count(v) AS nv " +
        "FROM mvcat.fact GROUP BY k % 5"
    val created = spark.sql("CALL mvcat.system.create_materialized_view(" +
      s"'daily', '$defSql')").collect()(0)
    assert(created.getLong(created.fieldIndex("cursor")) == 2L)
    assert(mvRows("daily") == recompute(defSql), "bootstrap diverges")

    // append
    spark.sql("""INSERT INTO mvcat.fact
      SELECT id, id * 10 FROM range(300, 400) ORDER BY id""")
    // merge-on-read MERGE: matched updates (paired CDF images) + inserts
    spark.sql("SELECT id AS k, id AS v FROM range(250, 420)")
      .createOrReplaceTempView("mv_stage")
    spark.sql("""MERGE INTO mvcat.fact t USING mv_stage s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    // deletion-vector delete (rich non-key predicate)
    spark.sql("DELETE FROM mvcat.fact WHERE v % 7 = 2")
    // equality-manifest delete (key-IN shape)
    spark.sql("DELETE FROM mvcat.fact WHERE k IN (5, 55, 155, 255, 355)")
    // copy-on-write delete (mode flipped live)
    spark.sql("ALTER TABLE mvcat.fact SET TBLPROPERTIES(" +
      "'write.delete.mode'='copy-on-write')")
    spark.sql("DELETE FROM mvcat.fact WHERE v % 13 = 4")
    // compaction: changelog-invisible by contract
    spark.sql("CALL mvcat.system.compact('fact', 2)")

    val r1 = spark.sql("CALL mvcat.system.refresh_mv('daily')").collect()(0)
    assert(r1.getLong(r1.fieldIndex("refreshed")) == 1L)
    assert(mvRows("daily") == recompute(defSql),
      "incremental refresh diverges from the recompute")
    // converged: second tick commits nothing
    val r2 = spark.sql("CALL mvcat.system.refresh_mv('daily')").collect()(0)
    assert(r2.getLong(r2.fieldIndex("refreshed")) == 0L)
    assert(r2.getLong(r2.fieldIndex("from_version")) ==
      r2.getLong(r2.fieldIndex("to_version")))
  }

  test("SUM over a nullable input: an all-null group reads NULL (not 0), " +
      "and group liveness drops a fully-deleted group") {
    warehouse
    spark.sql("""CREATE TABLE mvcat.nf (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k',
        'write.delete.mode'='merge-on-read')""")
    // group 0: all-null values; group 1: mixed; group 2: to be emptied
    spark.sql("""INSERT INTO mvcat.nf SELECT id,
      CASE WHEN id % 3 = 0 THEN NULL
           WHEN id % 3 = 1 AND id < 30 THEN NULL
           ELSE id END
      FROM range(60) ORDER BY id""")
    val defSql = "SELECT k % 3 AS grp, sum(v) AS total, count(*) AS n " +
      "FROM mvcat.nf GROUP BY k % 3"
    spark.sql(s"CALL mvcat.system.create_materialized_view('nv', '$defSql')")
    assert(mvRows("nv") == recompute(defSql))
    val g0 = spark.sql("SELECT total FROM mvcat.nv WHERE grp = 0").collect()(0)
    assert(g0.isNullAt(0), "all-null group must read NULL, not 0")
    // delete the only non-null values of group 1 -> its sum turns NULL
    spark.sql("DELETE FROM mvcat.nf WHERE k % 3 = 1 AND v IS NOT NULL")
    // empty group 2 entirely -> the group must disappear
    spark.sql("DELETE FROM mvcat.nf WHERE k % 3 = 2")
    spark.sql("CALL mvcat.system.refresh_mv('nv')")
    assert(mvRows("nv") == recompute(defSql), "null/liveness refresh diverges")
    assert(spark.sql("SELECT * FROM mvcat.nv WHERE grp = 2").count() == 0)
    assert(spark.sql("SELECT total FROM mvcat.nv WHERE grp = 1")
      .collect()(0).isNullAt(0))
  }

  test("a WHERE in the definition filters the changelog deltas the same " +
      "way; NULL group keys form a real group") {
    warehouse
    spark.sql("""CREATE TABLE mvcat.wf (k BIGINT, tag BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k')""")
    spark.sql("""INSERT INTO mvcat.wf SELECT id,
      CASE WHEN id % 4 = 0 THEN NULL ELSE id % 4 END, id
      FROM range(100) ORDER BY id""")
    val defSql = "SELECT tag AS grp, count(*) AS n, sum(v) AS total " +
      "FROM mvcat.wf WHERE v % 2 = 0 GROUP BY tag"
    spark.sql(s"CALL mvcat.system.create_materialized_view('wv', '$defSql')")
    assert(mvRows("wv") == recompute(defSql))
    spark.sql("""INSERT INTO mvcat.wf SELECT id,
      CASE WHEN id % 4 = 0 THEN NULL ELSE id % 4 END, id
      FROM range(100, 160) ORDER BY id""")
    spark.sql("CALL mvcat.system.refresh_mv('wv')")
    assert(mvRows("wv") == recompute(defSql), "filtered refresh diverges")
    assert(spark.sql("SELECT n FROM mvcat.wv WHERE grp IS NULL")
      .collect()(0).getLong(0) > 0, "NULL group must be maintained")
  }

  test("min/max refresh: insert-only groups fold from the changelog; a " +
      "delete of the current extremum rescans ONLY the dirty groups; an " +
      "emptied group disappears") {
    warehouse
    spark.sql("""CREATE TABLE mvcat.mx (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k',
        'write.delete.mode'='merge-on-read')""")
    spark.sql("""INSERT INTO mvcat.mx SELECT id,
      CASE WHEN id % 13 = 5 THEN NULL ELSE id * 3 END
      FROM range(400) ORDER BY id""")
    val defSql = "SELECT k % 4 AS grp, min(v) AS lo, max(v) AS hi, " +
      "count(*) AS n FROM mvcat.mx GROUP BY k % 4"
    spark.sql(s"CALL mvcat.system.create_materialized_view('mxv', '$defSql')")
    assert(mvRows("mxv") == recompute(defSql), "extrema bootstrap diverges")
    // insert-only tick: pure changelog fold (new max in group 1, new
    // min impossible - monotone fold suffices)
    spark.sql("INSERT INTO mvcat.mx SELECT id, id * 3 FROM range(400, 450)")
    spark.sql("CALL mvcat.system.refresh_mv('mxv')")
    assert(mvRows("mxv") == recompute(defSql), "insert-only fold diverges")
    // delete the CURRENT max of group 2 (and some mins of group 3):
    // those groups are dirty and rescan; group 0/1 untouched
    spark.sql("DELETE FROM mvcat.mx WHERE k >= 440 AND k % 4 = 2")
    spark.sql("DELETE FROM mvcat.mx WHERE k < 40 AND k % 4 = 3")
    spark.sql("CALL mvcat.system.refresh_mv('mxv')")
    assert(mvRows("mxv") == recompute(defSql), "dirty-group rescan diverges")
    // empty a whole group -> it must disappear from the view
    spark.sql("DELETE FROM mvcat.mx WHERE k % 4 = 1")
    spark.sql("CALL mvcat.system.refresh_mv('mxv')")
    assert(mvRows("mxv") == recompute(defSql))
    assert(spark.sql("SELECT * FROM mvcat.mxv WHERE grp = 1").count() == 0)
  }

  test("join MV: refresh applies the signed delta-join identity across " +
      "mutations on BOTH sides and equals the recompute; converged " +
      "refresh commits nothing") {
    warehouse
    spark.sql("""CREATE TABLE mvcat.jf (ok BIGINT, ck BIGINT, cents BIGINT)
      TBLPROPERTIES('key_col'='ok', 'zone_cols'='ck',
        'write.delete.mode'='merge-on-read')""")
    spark.sql("""CREATE TABLE mvcat.jd (ck BIGINT, seg BIGINT)
      TBLPROPERTIES('key_col'='ck')""")
    spark.sql("""INSERT INTO mvcat.jf
      SELECT id, id % 40, id * 7 FROM range(600) ORDER BY id""")
    spark.sql("""INSERT INTO mvcat.jd
      SELECT id, id % 5 FROM range(50) ORDER BY id""")
    val defSql = "SELECT seg, count(*) AS n, sum(cents) AS total " +
      "FROM mvcat.jf f JOIN mvcat.jd d ON f.ck = d.ck GROUP BY seg"
    spark.sql(s"CALL mvcat.system.create_materialized_view('jv', '$defSql')")
    assert(mvRows("jv") == recompute(defSql), "join bootstrap diverges")
    // fact-side delta only (dim unchanged): DeltaA x B@old
    spark.sql("INSERT INTO mvcat.jf SELECT id, id % 40, id * 7 " +
      "FROM range(600, 700)")
    spark.sql("DELETE FROM mvcat.jf WHERE ok % 9 = 2")
    var r = spark.sql("CALL mvcat.system.refresh_mv('jv')").collect()(0)
    assert(r.getLong(r.fieldIndex("refreshed")) == 1L)
    assert(mvRows("jv") == recompute(defSql), "fact-side delta diverges")
    // dim-side delta only: A@new x DeltaB -- a dim DELETE retires every
    // joined fact row of that key; a dim INSERT admits new matches
    spark.sql("DELETE FROM mvcat.jd WHERE ck IN (3, 17)")
    spark.sql("INSERT INTO mvcat.jd SELECT id, id % 5 FROM range(50, 60)")
    spark.sql("CALL mvcat.system.refresh_mv('jv')")
    assert(mvRows("jv") == recompute(defSql), "dim-side delta diverges")
    // BOTH sides move in one tick: DeltaA x B@old + A@new x DeltaB
    spark.sql("INSERT INTO mvcat.jf SELECT id, id % 60, id " +
      "FROM range(700, 760)")
    spark.sql("DELETE FROM mvcat.jd WHERE ck = 8")
    spark.sql("INSERT INTO mvcat.jd SELECT id, id % 5 FROM range(60, 65)")
    spark.sql("CALL mvcat.system.refresh_mv('jv')")
    assert(mvRows("jv") == recompute(defSql), "two-sided delta diverges")
    r = spark.sql("CALL mvcat.system.refresh_mv('jv')").collect()(0)
    assert(r.getLong(r.fieldIndex("refreshed")) == 0L, "converged must no-op")
  }

  test("non-maintainable definitions refuse loudly: min/max over a join, " +
      "outer/self joins, distinct; drop removes both halves") {
    warehouse
    spark.sql("""CREATE TABLE mvcat.rf (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k')""")
    spark.sql("""CREATE TABLE mvcat.rd (dk BIGINT, w BIGINT)
      TBLPROPERTIES('key_col'='dk')""")
    spark.sql("INSERT INTO mvcat.rf SELECT id, id FROM range(10)")
    spark.sql("INSERT INTO mvcat.rd SELECT id, id FROM range(10)")
    def refuse(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(
        s"CALL mvcat.system.create_materialized_view('bad', '$sql')"))
      assert(e.getMessage != null && e.getMessage.contains(frag),
        s"${e.getMessage} !contains $frag")
    }
    refuse("SELECT k % 2 AS g, max(w) AS m FROM mvcat.rf " +
      "JOIN mvcat.rd ON k = dk GROUP BY k % 2", "rescan would have to re-join")
    refuse("SELECT k % 2 AS g, count(*) AS n FROM mvcat.rf " +
      "LEFT JOIN mvcat.rd ON k = dk GROUP BY k % 2", "INNER")
    refuse("SELECT a.k % 2 AS g, count(*) AS n FROM mvcat.rf a " +
      "JOIN mvcat.rf b ON a.k = b.k GROUP BY a.k % 2", "self-join")
    refuse("SELECT k % 2 AS g, count(*) AS n FROM mvcat.rf " +
      "JOIN mvcat.rd ON k < dk GROUP BY k % 2", "not an equality")
    refuse("SELECT k % 2 AS g, count(DISTINCT v) AS n FROM mvcat.rf " +
      "GROUP BY k % 2", "DISTINCT")
    // lifecycle: create then drop removes the view AND the store
    spark.sql("CALL mvcat.system.create_materialized_view('ok', " +
      "'SELECT k % 2 AS g, count(*) AS n FROM mvcat.rf GROUP BY k % 2')")
    assert(spark.sql("SELECT * FROM mvcat.ok").count() == 2)
    spark.sql("CALL mvcat.system.drop_materialized_view('ok')")
    intercept[Exception](spark.sql("SELECT * FROM mvcat.ok").collect())
    intercept[Exception](
      spark.sql("CALL mvcat.system.refresh_mv('ok')").collect())
  }
}
