package graft

import graft.operators.TableFormat

/** LIMIT pushdown as metadata FILE-PREFIX pruning: a bare `LIMIT n`
  * needs any n rows and commit stats record exact per-file counts, so
  * the scan plans only a prefix of files reaching n — refused under
  * pending merge-on-read manifests (recorded counts would overcount). */
class LimitPushdownSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_lim").toString
    spark.conf.set("spark.sql.catalog.limcat",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.limcat.warehouse", wh)
    wh
  }

  private def mk(name: String): String = {
    import spark.implicits._
    val root = s"$warehouse/$name"
    val files = (0 until 4).flatMap { b =>
      (0L until 100L).map(i => (b * 1000L + i, i * 1.0)).toDF("k", "v")
        .repartition(1).write.mode("overwrite").parquet(s"$root/b$b")
      TableFormat.listParquet(spark, s"$root/b$b")
    }
    TableFormat.commitFiles(spark, root, "k", files, 1 << 12, 5)
    root
  }

  test("LIMIT plans a file prefix; results stay a correct limit") {
    mk("t")
    val df = spark.sql("SELECT k FROM limcat.t LIMIT 30")
    val rows = df.collect()
    assert(rows.length == 30)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LimitPrefix: 30"), plan)
    // one 100-row file covers LIMIT 30: the other three never plan
    assert(plan.contains("PrunedFiles: 3/4"), plan)
    // a limit spanning file boundaries keeps exactly enough files
    val df2 = spark.sql("SELECT k FROM limcat.t LIMIT 150")
    assert(df2.collect().length == 150)
    assert(df2.queryExecution.executedPlan.toString
      .contains("PrunedFiles: 2/4"))
  }

  test("pending merge-on-read masks refuse the prefix; limit stays exact") {
    val root = mk("m")
    TableFormat.deleteKeysMoR(spark, root, root, (0L until 95L))
    val df = spark.sql("SELECT k FROM limcat.m LIMIT 30")
    // file 0 has only 5 live rows: a trusted prefix would under-deliver
    assert(df.collect().length == 30)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LimitPrefix: none"), plan)
    assert(plan.contains("PrunedFiles: 0/4"), plan)
  }
}
