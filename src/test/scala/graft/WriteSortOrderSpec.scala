package graft

import graft.operators.TableFormat

/** WRITE-TIME SORT ORDER — the `write.sort-order` table property:
  * every write range-distributes + sorts by the declared columns (after
  * the partition spec's base columns when one exists), so data files
  * land with near-disjoint sort-column zones and range probes prune
  * files with no recluster rewrite ever scheduled. */
class WriteSortOrderSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wso").toString
    spark.conf.set("spark.sql.catalog.wsocat",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.wsocat.warehouse", wh)
    wh
  }

  test("an unpartitioned sort-ordered table lands range-clustered: " +
      "zones near-disjoint, range probes prune files") {
    warehouse
    spark.sql(s"""CREATE TABLE wsocat.so (k BIGINT, t BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k', 'zone_cols'='t',
        'write.sort-order'='t')""")
    // t is deliberately DECOUPLED from insertion order (k): only the
    // required distribution can make the file zones disjoint
    spark.range(4000)
      .selectExpr("id AS k", "(id * 2654435761) % 100000 AS t", "id AS v")
      .repartition(8) // scrambled input partitioning
      .createOrReplaceTempView("wso_src")
    // keep AQE from coalescing this small range shuffle into one task —
    // the multi-file layout is the test subject
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try spark.sql("INSERT INTO wsocat.so SELECT * FROM wso_src")
    finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", "true")
    val snap = TableFormat.snapshot(spark, s"$warehouse/so")
    assert(snap.files.size >= 2, snap.files.map(_.file))
    val zs = snap.files.map(_.zones("t")).sortBy(_._1)
    // consecutive zones overlap at most at a boundary value
    zs.sliding(2).foreach {
      case Seq(a, b) => assert(b._1 >= a._2, s"overlapping zones: $a $b")
      case _ =>
    }
    val df = spark.sql(
      "SELECT count(*) AS n FROM wsocat.so WHERE t BETWEEN 10000 AND 19999")
    val n = df.collect()(0).getLong(0)
    assert(n > 0)
    val m = "PrunedFiles: (\\d+)/(\\d+)".r
      .findFirstMatchIn(df.queryExecution.executedPlan.toString).get
    assert(m.group(1).toInt > 0,
      s"a 10%-domain window should prune files: ${df.queryExecution}")
  }

  test("with a partition spec, the sort columns order WITHIN each value " +
      "and read-back stays exact") {
    warehouse
    spark.sql(s"""CREATE TABLE wsocat.sb (k BIGINT, t BIGINT, v BIGINT)
      PARTITIONED BY (bucket(4, k))
      TBLPROPERTIES('zone_cols'='t', 'write.sort-order'='t')""")
    spark.range(1000)
      .selectExpr("id AS k", "(id * 48271) % 7919 AS t", "id * 3 AS v")
      .createOrReplaceTempView("wso_src2")
    spark.sql("INSERT INTO wsocat.sb SELECT * FROM wso_src2")
    val snap = TableFormat.snapshot(spark, s"$warehouse/sb")
    // layout unchanged: one file per bucket, pure tuples
    assert(snap.files.size == 4, snap.files.map(_.file))
    assert(snap.files.forall(_.part.exists(_._1 == "bucket(k, 4)")))
    val back = spark.sql("SELECT k, t, v FROM wsocat.sb").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(back.toSeq ==
      (0L until 1000L).map(k => (k, (k * 48271) % 7919, k * 3)))
  }

  test("an unknown sort column refuses loudly") {
    warehouse
    spark.sql(s"""CREATE TABLE wsocat.bad (k BIGINT, v BIGINT)
      TBLPROPERTIES('write.sort-order'='nope')""")
    spark.range(4).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("wso_src3")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO wsocat.bad SELECT * FROM wso_src3")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("nope")), e.toString)
  }
}
