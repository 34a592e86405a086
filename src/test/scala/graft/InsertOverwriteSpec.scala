package graft

import org.apache.spark.sql.functions._

import graft.operators.TableFormat

/** PARTIAL OVERWRITES on catalog tables — replace-where (Delta's
  * `INSERT OVERWRITE ... replaceWhere` shape, one atomic commit of
  * metadata arithmetic + the batch) and dynamic partition overwrite
  * (replace exactly the partition values present in the batch). A
  * whole-table `INSERT OVERWRITE` keeps its truncate semantics. */
class InsertOverwriteSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_iow").toString
    spark.conf.set("spark.sql.catalog.owcat",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.owcat.warehouse", wh)
    wh
  }

  test("replace-where: whole files drop, boundary files rewrite, the " +
      "batch lands — one commit") {
    warehouse
    spark.sql(s"""CREATE TABLE owcat.rw (k BIGINT, g BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k', 'zone_cols'='g')""")
    // three g-disjoint slices -> three-ish files with tight g zones
    (0 to 2).foreach { i =>
      spark.range(i * 10, i * 10 + 10)
        .selectExpr("id AS k", "id AS g", "id * 2 AS v")
        .coalesce(1).createOrReplaceTempView("iow_src")
      spark.sql("INSERT INTO owcat.rw SELECT * FROM iow_src")
    }
    val vBefore = TableFormat.snapshot(spark, s"$warehouse/rw").version
    // replace [5, 14]: straddles the first file (rewrite) and swallows
    // half the second
    spark.range(5, 15).selectExpr("id AS k", "id AS g", "id * 100 AS v")
      .writeTo("owcat.rw").overwrite(col("g").between(5, 14))
    val snap = TableFormat.snapshot(spark, s"$warehouse/rw")
    assert(snap.version == vBefore + 1, "one atomic commit")
    assert(snap.op.contains("overwrite_where"))
    val back = spark.sql("SELECT k, v FROM owcat.rw ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = (0L until 30L).map(k =>
      (k, if (k >= 5 && k <= 14) k * 100 else k * 2))
    assert(back.toSeq == expect)
  }

  test("replace-where refuses a batch with rows outside the scope") {
    warehouse
    spark.sql(s"""CREATE TABLE owcat.oos (k BIGINT, g BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k', 'zone_cols'='g')""")
    spark.range(20).selectExpr("id AS k", "id AS g", "id AS v")
      .createOrReplaceTempView("iow_src2")
    spark.sql("INSERT INTO owcat.oos SELECT * FROM iow_src2")
    val e = intercept[Exception] {
      spark.range(0, 20).selectExpr("id AS k", "id AS g", "id AS v")
        .writeTo("owcat.oos").overwrite(col("g") < 10)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("OUTSIDE the")), e.toString)
    // the refused write left the table untouched
    assert(spark.sql("SELECT count(*) FROM owcat.oos").collect()(0)
      .getLong(0) == 20)
  }

  test("whole-table INSERT OVERWRITE keeps truncate semantics") {
    warehouse
    spark.sql("CREATE TABLE owcat.tr (k BIGINT, v BIGINT)")
    spark.range(10).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("iow_src3")
    spark.sql("INSERT INTO owcat.tr SELECT * FROM iow_src3")
    spark.range(100, 103).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("iow_src4")
    spark.sql("INSERT OVERWRITE owcat.tr SELECT * FROM iow_src4")
    assert(spark.sql("SELECT min(k), max(k), count(*) FROM owcat.tr")
      .collect()(0).toSeq == Seq(100L, 102L, 3L))
  }

  test("dynamic partition overwrite replaces exactly the batch's buckets") {
    warehouse
    spark.sql(s"""CREATE TABLE owcat.dyn (k BIGINT, v BIGINT)
      PARTITIONED BY (bucket(4, k))""")
    spark.range(40).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("iow_src5")
    spark.sql("INSERT INTO owcat.dyn SELECT * FROM iow_src5")
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // buckets {1, 3} only (k % 4 in {1, 3}), new values
      spark.range(40).filter("id % 4 IN (1, 3)")
        .selectExpr("id AS k", "id * 1000 AS v")
        .createOrReplaceTempView("iow_src6")
      spark.sql("INSERT OVERWRITE owcat.dyn SELECT * FROM iow_src6")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    val back = spark.sql("SELECT k, v FROM owcat.dyn ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = (0L until 40L).map(k =>
      (k, if (k % 4 == 1 || k % 4 == 3) k * 1000 else k))
    assert(back.toSeq == expect)
    val snap = TableFormat.snapshot(spark, s"$warehouse/dyn")
    assert(snap.op.contains("overwrite_where"))
  }

  test("dynamic overwrite refuses a mixed (tuple-less) layout") {
    warehouse
    spark.sql(s"""CREATE TABLE owcat.mix (k BIGINT, v BIGINT)
      PARTITIONED BY (bucket(4, k))""")
    spark.range(40).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("iow_src7")
    spark.sql("INSERT INTO owcat.mix SELECT * FROM iow_src7")
    // compaction across values clears the tuples
    TableFormat.compact(spark, s"$warehouse/mix", s"$warehouse/mix/data", 1)
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val e = intercept[Exception] {
        spark.range(4).selectExpr("id AS k", "id AS v")
          .createOrReplaceTempView("iow_src8")
        spark.sql("INSERT OVERWRITE owcat.mix SELECT * FROM iow_src8")
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("mixed layout")), e.toString)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }
}
