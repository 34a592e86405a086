package graft

import org.apache.spark.sql.functions._

import graft.operators.TableFormat

/** SQL MERGE-ON-READ row-level operations (Spark's `SupportsDelta` over
  * the format's deletion vectors): `write.update.mode` /
  * `write.merge.mode` / `write.delete.mode` = 'merge-on-read' route
  * UPDATE / MERGE INTO / rich-predicate DELETE through a delta write —
  * matched rows mask by file-absolute ordinal in DV sidecars, new rows
  * append, ONE commit, zero data-file rewrites. */
class GraftDeltaSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_delta").toString
    spark.conf.set("spark.sql.catalog.dcat",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.dcat.warehouse", wh)
    wh
  }

  private var n = 0

  /** A fresh MoR-moded table of (k, v = k * 10, grp = k % 3) over
    * k in [0, 300), written as 3 files through the SQL insert path. */
  private def mkTable(modes: Seq[String]): (String, String) = {
    warehouse // force: registers the catalog before the first SQL
    n += 1
    val t = s"dt$n"
    val props = (Seq("'key_col'='k'", "'zone_cols'='grp'") ++
      modes.map(m => s"'write.$m.mode'='merge-on-read'")).mkString(", ")
    spark.sql(s"CREATE TABLE dcat.$t (k BIGINT, v BIGINT, grp BIGINT) " +
      s"TBLPROPERTIES($props)")
    spark.range(300).selectExpr("id AS k", "id * 10 AS v", "id % 3 AS grp")
      .repartition(3).createOrReplaceTempView(s"src_$t")
    spark.sql(s"INSERT INTO dcat.$t SELECT * FROM src_$t") // v2
    (t, s"$warehouse/$t")
  }

  private def kvs(sql: String): Seq[(Long, Long)] =
    spark.sql(sql).select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("UPDATE under write.update.mode=merge-on-read: one dv-update " +
      "commit, no data-file rewrite, DVs + appended batch; time travel " +
      "exact; copy-on-write twin rewrites instead") {
    val (t, root) = mkTable(Seq("update"))
    val v2 = TableFormat.snapshot(spark, root)
    assert(v2.version == 2)
    spark.sql(s"UPDATE dcat.$t SET v = v + 1 WHERE k % 50 = 7") // 6 rows
    val v3 = TableFormat.snapshot(spark, root)
    assert(v3.op.contains("dv-update"), v3.op)
    // every v2 data file survives BY REFERENCE (same path, same seq),
    // now carrying a deletion vector; exactly one appended batch of the
    // 6 replacement rows rides above
    val v2Files = v2.files.map(f => (f.file, f.seq)).toSet
    assert(v3.files.filter(f => v2Files.contains((f.file, f.seq)))
      .size == v2.files.size)
    val added = v3.files.filterNot(f => v2Files.contains((f.file, f.seq)))
    assert(added.nonEmpty && added.map(_.nRows).sum == 6, added)
    assert(v3.files.map(f => f.dv.map(_._2).getOrElse(0L)).sum == 6)
    // content: updated rows carry v+1, everything else untouched
    assert(kvs(s"SELECT * FROM dcat.$t") ==
      (0L until 300L).map(k => (k, k * 10 + (if (k % 50 == 7) 1 else 0))))
    // time travel reads the pre-update content
    assert(kvs(s"SELECT * FROM dcat.$t VERSION AS OF 2") ==
      (0L until 300L).map(k => (k, k * 10)))
    // count(*) stays exact metadata arithmetic under the vectors
    assert(spark.sql(s"SELECT count(*) FROM dcat.$t").collect()(0)
      .getLong(0) == 300L)

    // the copy-on-write twin (no mode property) REWRITES the touched
    // files: the group-based plan, no vectors
    val (t2, root2) = mkTable(Seq.empty)
    spark.sql(s"UPDATE dcat.$t2 SET v = v + 1 WHERE k % 50 = 7")
    val c3 = TableFormat.snapshot(spark, root2)
    assert(c3.op.contains("update"), c3.op)
    assert(c3.files.forall(_.dv.isEmpty))
    assert(kvs(s"SELECT * FROM dcat.$t2") ==
      (0L until 300L).map(k => (k, k * 10 + (if (k % 50 == 7) 1 else 0))))
  }

  test("UPDATE with an arbitrary non-key predicate stays merge-on-read " +
      "and the pushed filter prunes files") {
    val (t, root) = mkTable(Seq("update"))
    // k is the key and each of the 3 files covers ~a third of the range:
    // a key-range predicate prunes files at plan time on the delta scan
    spark.sql(s"UPDATE dcat.$t SET v = 0 WHERE k >= 290 AND grp = 1")
    val v3 = TableFormat.snapshot(spark, root)
    assert(v3.op.contains("dv-update"), v3.op)
    val masked = v3.files.map(f => f.dv.map(_._2).getOrElse(0L)).sum
    assert(masked == (290L until 300L).count(_ % 3 == 1), masked)
    // only files whose key range spans [290, 300) may carry a vector
    v3.files.foreach(f =>
      if (f.dv.isDefined) assert(f.maxKey >= 290, s"${f.file} ${f.maxKey}"))
    assert(kvs(s"SELECT * FROM dcat.$t") ==
      (0L until 300L).map(k =>
        (k, if (k >= 290 && k % 3 == 1) 0L else k * 10)))
  }

  test("MERGE INTO under write.merge.mode=merge-on-read: matched update " +
      "+ not-matched insert land in ONE dv-merge commit") {
    val (t, root) = mkTable(Seq("merge"))
    spark.range(280, 320).selectExpr("id AS k", "id * 1000 AS v",
      "id % 3 AS grp").createOrReplaceTempView(s"stage_$t")
    spark.sql(
      s"""MERGE INTO dcat.$t AS tgt USING stage_$t AS s ON tgt.k = s.k
          WHEN MATCHED THEN UPDATE SET v = s.v
          WHEN NOT MATCHED THEN INSERT (k, v, grp) VALUES (s.k, s.v, s.grp)""")
    val v3 = TableFormat.snapshot(spark, root)
    assert(v3.version == 3 && v3.op.contains("dv-merge"), (v3.version, v3.op))
    // 20 matched rows masked, 20 + 20 rows appended (replacements + new)
    assert(v3.files.map(f => f.dv.map(_._2).getOrElse(0L)).sum == 20)
    assert(kvs(s"SELECT * FROM dcat.$t") ==
      ((0L until 280L).map(k => (k, k * 10)) ++
        (280L until 320L).map(k => (k, k * 1000))))
  }

  test("DELETE routing under write.delete.mode=merge-on-read: the key-IN " +
      "shape keeps the equality manifest, a rich predicate goes to DVs") {
    val (t, root) = mkTable(Seq("delete"))
    spark.sql(s"DELETE FROM dcat.$t WHERE k IN (5, 15, 25)")
    val v3 = TableFormat.snapshot(spark, root)
    assert(v3.op.contains("mor-delete"), v3.op) // q156's manifest path
    assert(v3.deletes.nonEmpty && v3.files.forall(_.dv.isEmpty))
    // a predicate no manifest/range shape can express: the delta path
    spark.sql(s"DELETE FROM dcat.$t WHERE v % 70 = 30 AND grp = 0")
    val v4 = TableFormat.snapshot(spark, root)
    assert(v4.op.contains("dv-delete"), v4.op)
    val expectGone = (0L until 300L).filter(k =>
      k == 5 || k == 15 || k == 25 ||
        ((k * 10) % 70 == 30 && k % 3 == 0))
    assert(kvs(s"SELECT * FROM dcat.$t") ==
      (0L until 300L).filterNot(expectGone.contains)
        .map(k => (k, k * 10)))
  }

  test("the changelog of a dv-update commit is the PAIRED " +
      "update_preimage/update_postimage sharing one _row_id (Delta CDF)") {
    val (t, root) = mkTable(Seq("update"))
    spark.sql(s"UPDATE dcat.$t SET v = 1 WHERE k = 123")
    val rows = TableFormat.changesBetween(spark, root, 2, 3)
      .select("_change", "k", "v", "_row_id").collect()
    val ch = rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(ch == Seq(("update_postimage", 123L, 1L),
      ("update_preimage", 123L, 1230L)), ch)
    // pre and post images share the row's lineage id — the pairing key
    val ids = rows.map(_.getLong(3)).distinct
    assert(ids.length == 1, s"pre/post ids diverge: ${ids.toSeq}")
    // and the live row still carries that id (MoR update preserves it)
    assert(spark.sql(s"SELECT _row_id FROM dcat.$t WHERE k = 123")
      .collect()(0).getLong(0) == ids(0))
  }

  test("materialize_deletes clears the vectors a SQL MoR update left and " +
      "preserves content; an update masking a whole file drops it") {
    val (t, root) = mkTable(Seq("update"))
    spark.sql(s"UPDATE dcat.$t SET v = -1 WHERE k % 10 = 3")
    spark.sql(s"CALL dcat.system.materialize_deletes('$t')")
    val v4 = TableFormat.snapshot(spark, root)
    assert(v4.files.forall(_.dv.isEmpty))
    assert(kvs(s"SELECT * FROM dcat.$t") ==
      (0L until 300L).map(k => (k, if (k % 10 == 3) -1L else k * 10)))

    // a one-file table fully replaced: the dead file DROPS, the commit
    // carries only the replacement batch
    val t2 = s"dtall$n"
    spark.sql(s"CREATE TABLE dcat.$t2 (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES('key_col'='k', 'write.update.mode'='merge-on-read')")
    spark.range(50).selectExpr("id AS k", "id AS v").coalesce(1)
      .createOrReplaceTempView(s"one_$t2")
    spark.sql(s"INSERT INTO dcat.$t2 SELECT * FROM one_$t2")
    val before = TableFormat.snapshot(spark, s"$warehouse/$t2")
    spark.sql(s"UPDATE dcat.$t2 SET v = k + 1000")
    val after = TableFormat.snapshot(spark, s"$warehouse/$t2")
    assert(after.op.contains("dv-update"))
    assert(after.files.map(_.file).toSet
      .intersect(before.files.map(_.file).toSet).isEmpty,
      "the fully-masked file must drop, not carry an all-ones bitmap")
    assert(after.files.forall(_.dv.isEmpty))
    assert(kvs(s"SELECT * FROM dcat.$t2") ==
      (0L until 50L).map(k => (k, k + 1000)))
  }

  test("_file/_pos are first-class metadata columns on the plain scan " +
      "(file-absolute, pre-mask ordinals)") {
    val (t, root) = mkTable(Seq("update"))
    val q = spark.sql(s"SELECT _file, _pos, k FROM dcat.$t")
    // the metadata projection stays COLUMNAR: _file/_pos synthesize as
    // vectors over the vectorized batches, no row-reader fallback
    assert(q.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      q.queryExecution.executedPlan.toString)
    val rows = q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 300)
    // per file, ordinals are dense from 0
    rows.groupBy(_._1).foreach { case (f, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (0L until rs.length).toSeq, f)
    }
    // after masking, ordinals stay FILE-ABSOLUTE (gaps where rows died)
    spark.sql(s"UPDATE dcat.$t SET v = 0 WHERE k = ${rows.head._3}")
    val after = spark.sql(s"SELECT _file, _pos FROM dcat.$t").count()
    assert(after == 300) // 299 survivors + 1 replacement
  }

  test("a merge-on-read MERGE on a bucket-partitioned table keeps the " +
      "layout: appended files tuple-pure + sorted, and the maintenance " +
      "chain restores the exchange- and sort-free SPJ") {
    warehouse
    spark.sql(s"""CREATE TABLE dcat.bm (k BIGINT, v BIGINT)
      PARTITIONED BY (bucket(4, k))
      TBLPROPERTIES('${TableFormat.MergeModeProp}'='merge-on-read')""")
    spark.sql("INSERT INTO dcat.bm SELECT id AS k, id * 2 AS v " +
      "FROM range(400)")
    spark.sql("""CREATE TABLE dcat.bn (k BIGINT, w BIGINT)
      PARTITIONED BY (bucket(4, k))""")
    spark.sql("INSERT INTO dcat.bn SELECT id AS k, id * 10 AS w " +
      "FROM range(600)")
    spark.sql("SELECT id AS k, id * 3 AS v FROM range(300, 600)")
      .createOrReplaceTempView("stage_bm")
    spark.sql("""MERGE INTO dcat.bm t USING stage_bm s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val root = s"$warehouse/bm"
    val v3 = TableFormat.snapshot(spark, root)
    assert(v3.op.contains("dv-merge"))
    // the appended batch went through the ROUTED writer: tuple-pure
    // sorted files, one per bucket value
    val added = v3.files.filter(_.seq == v3.version)
    assert(added.size == 4, added.map(_.file))
    assert(added.forall(f => f.sorted && f.part.exists(_._1 == "bucket(k, 4)")),
      added.map(f => (f.sorted, f.part.map(_._1))))
    // maintenance: materialize the vectors (per-file, layout kept),
    // then bin-pack within tuples — the sort-free SPJ is back
    spark.sql("CALL dcat.system.materialize_deletes('bm')")
    val v4 = TableFormat.snapshot(spark, root)
    assert(v4.files.forall(f => f.dv.isEmpty && f.sorted &&
      f.part.exists(_._1 == "bucket(k, 4)")),
      v4.files.map(f => (f.dv, f.sorted, f.part.map(_._1))))
    spark.sql("CALL dcat.system.compact_small_files('bm', 100000000)")
    val v5 = TableFormat.snapshot(spark, root)
    assert(v5.files.size == 4 && v5.files.forall(_.sorted))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql("SELECT a.k AS k, a.v AS v, b.w AS w " +
        "FROM dcat.bm a JOIN dcat.bn b ON a.k = b.k")
      val rows = j.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(rows == (0L until 600L).map(k =>
        (k, if (k >= 300) k * 3 else k * 2, k * 10)))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"shuffle:\n$plan")
      assert(!plan.contains("Sort ["), s"sort:\n$plan")
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
    }
  }

  test("the mode flips live via ALTER TABLE SET TBLPROPERTIES, delta " +
      "updates work across a column rename, and CHECK constraints " +
      "validate the replacement batch") {
    val (t, root) = mkTable(Seq.empty) // copy-on-write by default
    spark.sql(s"ALTER TABLE dcat.$t SET TBLPROPERTIES(" +
      s"'${TableFormat.UpdateModeProp}'='merge-on-read')")
    // era ledger: rename the value column, then a MoR update through
    // the NEW name — old-era files read through the mapping, the
    // replacement batch writes current names (the constraint lands
    // AFTER the rename: constraint-referenced renames refuse, q154)
    spark.sql(s"ALTER TABLE dcat.$t RENAME COLUMN v TO amount")
    spark.sql(s"ALTER TABLE dcat.$t SET TBLPROPERTIES(" +
      "'constraint.v_bound'='amount < 100000')")
    spark.sql(s"UPDATE dcat.$t SET amount = 1 WHERE k = 42")
    val snap = TableFormat.snapshot(spark, root)
    assert(snap.op.contains("dv-update"), snap.op)
    val got = spark.sql(s"SELECT k, amount FROM dcat.$t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == (0L until 300L).map(k => (k, if (k == 42) 1L else k * 10)))
    // the constraint rejects a violating replacement batch LOUDLY and
    // nothing commits
    val before = TableFormat.snapshot(spark, root).version
    val ex = intercept[Exception] {
      spark.sql(s"UPDATE dcat.$t SET amount = 200000 WHERE k = 7")
    }
    assert(exceptionChain(ex).exists(_.getMessage != null) &&
      exceptionChain(ex).exists(m => m.getMessage != null &&
        m.getMessage.contains("v_bound")), ex.getMessage)
    assert(TableFormat.snapshot(spark, root).version == before)
    assert(spark.sql(s"SELECT amount FROM dcat.$t WHERE k = 7")
      .collect()(0).getLong(0) == 70L)
  }

  private def exceptionChain(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq

  test("two delta commits derived from the same snapshot COMPOSE when " +
      "they touch different files, and conflict loudly on the same file") {
    val (t, root) = mkTable(Seq("update"))
    val base = TableFormat.snapshot(spark, root)
    val files = base.files.map(_.file).sorted
    assert(files.size >= 2)
    def bm(ps: Long*) = {
      val b = new org.roaringbitmap.longlong.Roaring64Bitmap()
      ps.foreach(b.addLong)
      b
    }
    // disjoint touched files: the CAS loser re-derives and both land
    TableFormat.commitDelta(spark, root, base,
      Map(files(0) -> bm(0L)), Seq.empty, "dv-update")
    val s2 = TableFormat.commitDelta(spark, root, base,
      Map(files(1) -> bm(0L)), Seq.empty, "dv-update")
    assert(s2.files.count(_.dv.isDefined) == 2)
    // same touched file: the second statement's pre-images may have
    // been deleted by the first — refuse, demand a fresh derivation
    val base2 = TableFormat.snapshot(spark, root)
    TableFormat.commitDelta(spark, root, base2,
      Map(files(0) -> bm(1L)), Seq.empty, "dv-update")
    val ex = intercept[TableFormat.CommitConflictException] {
      TableFormat.commitDelta(spark, root, base2,
        Map(files(0) -> bm(2L)), Seq.empty, "dv-update")
    }
    assert(ex.getMessage.contains("deletion vector changed"), ex.getMessage)
  }

  test("a concurrent rewrite of a touched file fails the delta commit " +
      "loudly (stale ordinals must never mask other bytes)") {
    val (t, root) = mkTable(Seq("update"))
    val base = TableFormat.snapshot(spark, root)
    // simulate: the statement resolved `base`, then compaction rewrote
    // the files before its commit landed
    val bm = new org.roaringbitmap.longlong.Roaring64Bitmap()
    bm.addLong(0L)
    TableFormat.compact(spark, root, s"$root/data", nFiles = 1)
    val ex = intercept[TableFormat.CommitConflictException] {
      TableFormat.commitDelta(spark, root, base,
        Map(base.files.head.file -> bm), Seq.empty, "dv-update")
    }
    assert(ex.getMessage.contains("rewritten or removed"), ex.getMessage)
  }

  test("a concurrent equality-delete manifest fails a replacement-carrying " +
      "delta commit (resurrect guard) but not a pure dv-delete") {
    val (t, root) = mkTable(Seq("update"))
    val base = TableFormat.snapshot(spark, root)
    TableFormat.deleteKeysMoR(spark, root, s"$root/data", Seq(7L))
    val bm = new org.roaringbitmap.longlong.Roaring64Bitmap()
    bm.addLong(1L)
    val ex = intercept[TableFormat.CommitConflictException] {
      TableFormat.commitDelta(spark, root, base,
        Map(base.files.head.file -> bm), Seq.empty, "dv-update")
    }
    assert(ex.getMessage.contains("manifest"), ex.getMessage)
    // the pure delete composes: masks union whichever side wins
    val snap = TableFormat.commitDelta(spark, root, base,
      Map(base.files.head.file -> bm), Seq.empty, "dv-delete")
    assert(snap.op.contains("dv-delete"))
  }
}
