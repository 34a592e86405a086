package graft

import org.apache.spark.sql.functions._

import graft.operators.TableFormat

/** DELETION VECTORS — the positional (row-ordinal) delete shape next to
  * copy-on-write rewrites and equality-delete manifests: a predicate
  * delete commits O(deleted rows) of roaring-bitmap sidecar per file,
  * readers skip masked ordinals (library anti-join; vectorized per-batch
  * bitmap probe), metadata counts subtract exactly, maintenance
  * materializes, and the changelog emits exactly the newly-masked rows. */
class DeletionVectorSpec extends SparkTestBase {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_dv").toString

  /** A 3-file table of (k, v = k * 10) over k in [0, 300). */
  private def mkTable(root: String): TableFormat.Snapshot = {
    spark.range(300).selectExpr("id AS k", "id * 10 AS v")
      .repartition(3).write.mode("overwrite").parquet(s"$root/d0")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/d0"), 1 << 12, 5)
  }

  private def keysOf(snap: TableFormat.Snapshot): Seq[Long] =
    TableFormat.read(spark, snap).select("k").collect().map(_.getLong(0))
      .sorted.toSeq

  test("deletePositions masks matching rows with zero data rewrites; " +
      "time travel keeps the old content; a second delete merges") {
    val root = freshRoot()
    val s1 = mkTable(root)
    val dataFiles = s1.files.map(_.file).toSet
    val (s2, n2, aff2) = TableFormat.deletePositions(spark, root,
      s"$root/data", col("k") % 7 === 0)
    assert(n2 == 43 && aff2 == 3, s"$n2 / $aff2") // 0,7,...,294
    // no data file rewritten: same file set, vectors attached
    assert(s2.files.map(_.file).toSet == dataFiles)
    assert(s2.files.forall(_.dv.isDefined))
    assert(s2.files.map(_.dv.get._2).sum == 43)
    assert(keysOf(s2) == (0L until 300L).filter(_ % 7 != 0))
    assert(keysOf(TableFormat.snapshot(spark, root, Some(1))) ==
      (0L until 300L))
    // second delete MERGES bitmaps (union, not replacement)
    val (s3, n3, _) = TableFormat.deletePositions(spark, root,
      s"$root/data", col("k") % 5 === 0)
    assert(n3 == 60, n3)
    assert(keysOf(s3) == (0L until 300L).filter(k => k % 7 != 0 && k % 5 != 0))
    assert(s3.files.map(_.dv.get._2).sum == 43 + 60 - 9) // lcm 35: 9 overlap
    // liveRows metadata is exact
    assert(s3.files.map(_.liveRows).sum == keysOf(s3).size)
  }

  test("the distributed bitmap build writes sidecars BYTE-IDENTICAL to a " +
      "driver-side addLong build of the same ordinals") {
    // round-15: deletePositions aggregates ordinals into per-file
    // Roaring64 blobs executor-side (roaring_agg) — O(files) driver
    // traffic, no row cap. Roaring container layout is deterministic in
    // content, so the committed sidecar must equal a reference bitmap
    // built row-by-row on the driver from the same (file, ordinal) set.
    val root = freshRoot()
    val s1 = mkTable(root)
    // reference: collect matched (file, pos) the OLD way, build per-file
    // bitmaps with addLong, serialize with the writeDv codec
    val ref = spark.read.parquet(s1.files.map(_.file): _*)
      .select(col("_metadata.file_path").as("__file"),
        col("_metadata.row_index").as("__pos"), col("k"))
      .filter(col("k") % 3 === 0)
      .select(col("__file"), col("__pos")).collect()
      .groupBy(r => TableFormat.uriPathOf(r.getString(0)))
      .map { case (p, rows) =>
        val bm = new org.roaringbitmap.longlong.Roaring64Bitmap()
        rows.map(_.getLong(1)).sorted.reverse.foreach(bm.addLong) // order-free
        val bos = new java.io.ByteArrayOutputStream()
        bm.serialize(new java.io.DataOutputStream(bos))
        p -> bos.toByteArray
      }
    val (s2, n, aff) = TableFormat.deletePositions(spark, root,
      s"$root/data", col("k") % 3 === 0)
    assert(n == 100 && aff == 3, s"$n / $aff")
    val conf = spark.sparkContext.hadoopConfiguration
    s2.files.foreach { f =>
      val dvPath = new org.apache.hadoop.fs.Path(f.dv.get._1)
      val in = dvPath.getFileSystem(conf).open(dvPath)
      val len = dvPath.getFileSystem(conf).getFileStatus(dvPath).getLen.toInt
      val bytes = new Array[Byte](len)
      try in.readFully(bytes) finally in.close()
      val expect = ref(TableFormat.uriPathOf(f.file))
      assert(java.util.Arrays.equals(bytes, expect),
        s"sidecar bytes diverge for ${f.file}")
    }
  }

  test("a fully-dead file is dropped from the commit instead of carrying " +
      "an all-ones bitmap") {
    val root = freshRoot()
    import spark.implicits._
    (0L until 100L).map(k => (k, k * 10)).toDF("k", "v")
      .repartition(1).write.mode("overwrite").parquet(s"$root/a")
    (100L until 200L).map(k => (k, k * 10)).toDF("k", "v")
      .repartition(1).write.mode("overwrite").parquet(s"$root/b")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/a") ++
        TableFormat.listParquet(spark, s"$root/b"), 1 << 12, 5)
    val (s2, n, _) = TableFormat.deletePositions(spark, root,
      s"$root/data", col("k") < 100)
    assert(n == 100)
    assert(s2.files.size == 1 && s2.files.head.dv.isEmpty)
    assert(keysOf(s2) == (100L until 200L))
  }

  test("the SQL catalog reads through deletion vectors: vectorized scan, " +
      "pushed row-group filters, count(*) metadata, min/max fallback") {
    val root = freshRoot()
    mkTable(root)
    TableFormat.deletePositions(spark, root, s"$root/data",
      col("k") >= 290) // mask the top 10 keys
    val wh = new java.io.File(root).getParent
    spark.conf.set("spark.sql.catalog.dvcat",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.dvcat.warehouse", wh)
    val name = new java.io.File(root).getName
    val df = spark.sql(s"SELECT k, v FROM dvcat.`$name` ORDER BY k")
    // stays columnar (the DV masks over the vectorized batch)
    assert(df.queryExecution.executedPlan.toString.contains("Columnar"),
      df.queryExecution.executedPlan.toString)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 290 && rows.last == ((289L, 2890L)))
    // a pushed filter on the DV'd file strips to keep ordinals absolute;
    // the result stays exact
    val probe = spark.sql(
      s"SELECT k FROM dvcat.`$name` WHERE k IN (5, 295) ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(probe == Seq(5L), probe)
    // count(*) answers from metadata (liveRows) and is exact
    // the pushed metadata aggregate surfaces as a LocalTableScan of the
    // pushed `count_star` column — no data-file scan in the plan
    val cnt = spark.sql(s"SELECT count(*) AS n FROM dvcat.`$name`")
    assert(cnt.queryExecution.executedPlan.toString.contains("count_star"),
      cnt.queryExecution.executedPlan.toString)
    assert(cnt.collect()(0).getLong(0) == 290)
    // min/max refuse the metadata answer under a DV (a masked row may
    // hold the extremum) and scan instead — exact either way
    val mx = spark.sql(s"SELECT max(k) AS m FROM dvcat.`$name`")
    assert(!mx.queryExecution.executedPlan.toString.contains("min_")
      && !mx.queryExecution.executedPlan.toString.contains("max_k#"),
      mx.queryExecution.executedPlan.toString)
    assert(mx.collect()(0).getLong(0) == 289)
  }

  test("materializeDeletes rewrites DV'd files and drops the vectors; " +
      "content unchanged; the replace commit is changelog-free") {
    val root = freshRoot()
    mkTable(root)
    TableFormat.deletePositions(spark, root, s"$root/data",
      col("k") % 3 === 0)
    val before = keysOf(TableFormat.snapshot(spark, root))
    val (s3, nRe, nCa) = TableFormat.materializeDeletes(spark, root,
      s"$root/data")
    assert(nRe == 3 && nCa == 0, s"$nRe/$nCa")
    assert(s3.files.forall(_.dv.isEmpty))
    assert(keysOf(s3) == before)
    // exact metadata everywhere again
    val (n, mn, mxx) = TableFormat.statsSummary(s3)
    assert(n == before.size && mn == 1L && mxx == 299L)
  }

  test("statsSummary and approxDistinctKeys refuse under a pending DV; " +
      "countRange subtracts exactly for fully-covered files") {
    val root = freshRoot()
    mkTable(root)
    TableFormat.deletePositions(spark, root, s"$root/data",
      col("k") === 42)
    val snap = TableFormat.snapshot(spark, root)
    intercept[IllegalArgumentException](TableFormat.statsSummary(snap))
    intercept[IllegalArgumentException](TableFormat.approxDistinctKeys(snap))
    val (cnt, _, _, _) = TableFormat.countRange(spark, snap, "k", 0L, 299L)
    assert(cnt == 299, cnt)
  }

  test("the changelog emits exactly the newly-masked rows as deletes, " +
      "including a dropped fully-dead file") {
    val root = freshRoot()
    import spark.implicits._
    (0L until 50L).map(k => (k, k * 10)).toDF("k", "v")
      .repartition(1).write.mode("overwrite").parquet(s"$root/a")
    (50L until 100L).map(k => (k, k * 10)).toDF("k", "v")
      .repartition(1).write.mode("overwrite").parquet(s"$root/b")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/a") ++
        TableFormat.listParquet(spark, s"$root/b"), 1 << 12, 5)
    // v2: masks 0..9 (partial on file a); v3: kills all of file b (drop)
    TableFormat.deletePositions(spark, root, s"$root/data", col("k") < 10)
    TableFormat.deletePositions(spark, root, s"$root/data", col("k") >= 50)
    val ch2 = TableFormat.changesBetween(spark, root, 1, 2)
      .collect().map(r => (r.getAs[String]("_change"), r.getAs[Long]("k")))
    assert(ch2.forall(_._1 == "delete") &&
      ch2.map(_._2).sorted.toSeq == (0L until 10L), ch2.toSeq)
    val ch3 = TableFormat.changesBetween(spark, root, 2, 3)
      .collect().map(r => (r.getAs[String]("_change"), r.getAs[Long]("k")))
    assert(ch3.forall(_._1 == "delete") &&
      ch3.map(_._2).sorted.toSeq == (50L until 100L), ch3.length)
    // a second delete of the SAME rows is a no-op commit (no version)
    val vBefore = TableFormat.versions(spark, root).last
    val (_, n, _) = TableFormat.deletePositions(spark, root, s"$root/data",
      col("k") < 0)
    assert(n == 0 && TableFormat.versions(spark, root).last == vBefore)
  }

  test("a copy-on-write SQL UPDATE over a DV'd table does not resurrect " +
      "masked rows") {
    val root = freshRoot()
    mkTable(root)
    TableFormat.deletePositions(spark, root, s"$root/data",
      col("k") % 2 === 1) // mask odds
    val wh = new java.io.File(root).getParent
    spark.conf.set("spark.sql.catalog.dvcat2",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.dvcat2.warehouse", wh)
    val name = new java.io.File(root).getName
    spark.sql(s"UPDATE dvcat2.`$name` SET v = v + 1 WHERE k < 100")
    val rows = spark.sql(s"SELECT k, v FROM dvcat2.`$name` ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == (0L until 300L by 2).map(k =>
      (k, if (k < 100) k * 10 + 1 else k * 10)), rows.take(5))
  }

  test("expireSnapshots keeps referenced sidecars and sweeps orphaned ones") {
    val root = freshRoot()
    import spark.implicits._
    // ONE data file, so the second delete merges into a NEW sidecar and
    // deterministically orphans the first
    (0L until 300L).map(k => (k, k * 10)).toDF("k", "v")
      .repartition(1).write.mode("overwrite").parquet(s"$root/d0")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/d0"), 1 << 12, 5)
    TableFormat.deletePositions(spark, root, s"$root/data",
      col("k") === 7)                                      // v2: dv A
    TableFormat.deletePositions(spark, root, s"$root/data",
      col("k") === 8)                                      // v3: dv A∪B (A orphaned)
    val live = TableFormat.snapshot(spark, root).files
      .flatMap(_.dv.map(_._1)).toSet
    val (expired, removed) = TableFormat.expireSnapshots(spark, root,
      keepLast = 1, dataDirs = Seq(s"$root/data"), graceMs = 0L)
    assert(expired == Seq(1L, 2L), expired)
    val fs = new java.io.File(s"$root/data")
    def rbms(d: java.io.File): Seq[String] =
      Option(d.listFiles()).toSeq.flatten.flatMap(f =>
        if (f.isDirectory) rbms(f)
        else if (f.getName.endsWith(".rbm")) Seq(f.getAbsolutePath) else Nil)
    val onDisk = rbms(fs).map(p => new org.apache.hadoop.fs.Path(p)
      .toUri.getPath).toSet
    assert(onDisk == live.map(p => new org.apache.hadoop.fs.Path(p)
      .toUri.getPath), s"on disk: $onDisk, live: $live")
    // the survivor still reads exactly
    assert(keysOf(TableFormat.snapshot(spark, root)) ==
      (0L until 300L).filter(k => k != 7 && k != 8))
    assert(removed.exists(_.endsWith(".rbm")), removed)
  }
}
