package graft

import graft.operators.TableFormat

/** TARGET FILE SIZE on the SQL write path — the
  * `write.target-file-size-bytes` table property (Iceberg's knob, 512 MB
  * default): the executor writer ROLLS an open data file when its
  * buffered+written bytes reach the target. This is what bounds a
  * SKEWED partition value under clustered distribution — one task per
  * partition value means one unbounded file without it. Rolled files
  * still hold a single partition value, so the recorded partition
  * tuples (and everything planned from them: storage-partitioned
  * joins, t$partitions) stay pure. */
class TargetFileSizeSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_tfs").toString
    spark.conf.set("spark.sql.catalog.tfscat",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.tfscat.warehouse", wh)
    wh
  }

  test("a tiny target rolls each partition value across multiple files; " +
      "rows and tuples stay exact") {
    warehouse
    spark.sql(s"""CREATE TABLE tfscat.roll (k BIGINT, v BIGINT)
      PARTITIONED BY (bucket(4, k))
      TBLPROPERTIES('write.target-file-size-bytes'='1')""")
    spark.range(400).selectExpr("id AS k", "id * 7 AS v")
      .createOrReplaceTempView("tfs_src")
    spark.sql("INSERT INTO tfscat.roll SELECT * FROM tfs_src")

    val snap = TableFormat.snapshot(spark, s"$warehouse/roll")
    // 100 rows per bucket, roll probe every 64 rows at target 1 byte:
    // each bucket splits into (at least) two files
    val byBucket = snap.files.groupBy(_.part.map(_._2.toSeq))
    assert(byBucket.keySet.size == 4, byBucket.keySet)
    byBucket.foreach { case (tuple, fs) =>
      assert(fs.size >= 2, s"bucket $tuple did not roll: ${fs.size} file(s)")
    }
    // every rolled file still carries a PURE current-spec tuple
    assert(snap.files.forall(_.part.exists(_._1 == "bucket(k, 4)")),
      snap.files.map(f => f.file -> f.part))

    // read-back fidelity through the catalog scan
    val back = spark.sql("SELECT k, v FROM tfscat.roll").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(back.toSeq == (0L until 400L).map(k => (k, k * 7)))

    // the partitions metadata table sees the same layout
    val parts = spark.sql(
      "SELECT part, n_files, n_rows FROM tfscat.`roll$partitions`")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(parts.length == 4)
    assert(parts.forall(_._2 >= 2), parts.toSeq)
    assert(parts.map(_._3).sum == 400L)
  }

  test("the default target leaves the one-file-per-value layout intact") {
    warehouse
    spark.sql(s"""CREATE TABLE tfscat.noroll (k BIGINT, v BIGINT)
      PARTITIONED BY (bucket(4, k))""")
    spark.range(400).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("tfs_src2")
    spark.sql("INSERT INTO tfscat.noroll SELECT * FROM tfs_src2")
    val snap = TableFormat.snapshot(spark, s"$warehouse/noroll")
    assert(snap.files.size == 4, snap.files.map(_.file))
  }

  test("rolling one bucket's file never closes the other writers of " +
      "the same run (path-based interleaved buckets)") {
    warehouse
    // path-based write (ordered fallback): buckets INTERLEAVE within a
    // task, so several bucket writers are open at once and the size
    // probe walks all of them. With target 1 and probe cadence 64,
    // 800 rows over 2 buckets in one task roll BOTH writers at each of
    // the ~12 probes — bounded by (probes x fan-out), and every row
    // must survive the churn exactly once.
    val root = s"$warehouse/inter"
    TableFormat.createEmpty(spark, root, "k", "k BIGINT, v BIGINT",
      props = Map(TableFormat.PartitionSpecProp -> "bucket(k, 2)",
        "write.target-file-size-bytes" -> "1"))
    spark.range(800).selectExpr("id AS k", "id AS v")
      .repartition(1)
      .write.format("graft-table").mode("append").save(root)
    val snap = TableFormat.snapshot(spark, root)
    val nFiles = snap.files.size
    // ~12 probes x 2 writers + <=2 tail files
    assert(nFiles >= 4 && nFiles <= 32, s"$nFiles files: ${snap.files.map(_.file)}")
    val back = spark.read.format("graft-table").load(root)
      .selectExpr("k").collect().map(_.getLong(0)).sorted
    assert(back.toSeq == (0L until 800L))
  }

  test("a malformed target refuses loudly at write time") {
    warehouse
    spark.sql(s"""CREATE TABLE tfscat.badtgt (k BIGINT, v BIGINT)
      TBLPROPERTIES('write.target-file-size-bytes'='lots')""")
    spark.range(4).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("tfs_src3")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO tfscat.badtgt SELECT * FROM tfs_src3")
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("write.target-file-size-bytes") ||
        Option(e.getCause).exists(
          _.getMessage.contains("write.target-file-size-bytes"))),
      e.toString)
  }
}
