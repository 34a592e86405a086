package graft

import org.apache.spark.sql.functions._

import graft.operators.TableFormat

/** SMALL-FILE PACKING on the catalog read path: a post-ingest tail of
  * tiny files reads through byte-bounded multi-file tasks (Spark's
  * maxSplitBytes arithmetic over recorded commit bytes) instead of one
  * task per file, with per-member manifests / era schemas / `_file`
  * synthesis preserved by the chained reader. */
class SmallFilePackingSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_pack").toString
    spark.conf.set("spark.sql.catalog.pkcat",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.pkcat.warehouse", wh)
    wh
  }

  private lazy val root: String = {
    val r = s"$warehouse/tiny"
    val base = spark.range(6400).selectExpr("id AS k", "id * 7 AS v")
    val files = (0 until 64).flatMap { i =>
      base.filter(pmod(col("k"), lit(64)) === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$r/s$i")
      TableFormat.listParquet(spark, s"$r/s$i")
    }
    TableFormat.commitFiles(spark, r, "k", files, 1 << 14, 5)
    r
  }

  private def marker(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
    val m = "PackedTasks: (\\d+)/(\\d+)".r
      .findFirstMatchIn(df.queryExecution.executedPlan.toString)
      .getOrElse(fail(s"no PackedTasks marker:\n${df.queryExecution}"))
    (m.group(1).toInt, m.group(2).toInt)
  }

  test("64 tiny files read in parallelism-many tasks, results exact") {
    root
    val df = spark.sql(s"SELECT k, v FROM pkcat.tiny")
    val (tasks, files) = marker(df)
    assert(files == 64, (tasks, files))
    // local[2]: the bytes-per-core floor keeps parallelism, openCost
    // dominates tiny files -> 2 bins of 32
    assert(tasks < files && tasks <= 8, (tasks, files))
    val back = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(back.toSeq == (0L until 6400L).map(k => (k, k * 7)))
    // the zero-projection count answers through the same packed chain
    assert(spark.sql("SELECT count(*) FROM pkcat.tiny").collect()(0)
      .getLong(0) == 6400L)
  }

  test("packing honors spark.sql.files.maxPartitionBytes") {
    root
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    // openCost (4 MB) per file: a 9 MB cap fits exactly 2 files per bin
    spark.conf.set("spark.sql.files.maxPartitionBytes", (9L << 20).toString)
    try {
      val (tasks, files) = marker(spark.sql("SELECT k FROM pkcat.tiny"))
      assert(files == 64 && tasks == 32, (tasks, files))
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("merge-on-read masks apply per member file inside a packed task") {
    root
    import spark.implicits._
    TableFormat.deleteKeysMoR(spark, root, root,
      Seq(17L, 1000L, 6399L).toDF("k"))
    val kept = spark.sql("SELECT k FROM pkcat.tiny").collect()
      .map(_.getLong(0)).toSet
    assert(kept.size == 6397 && !kept(17L) && !kept(1000L) && !kept(6399L))
  }

  test("key-grouped (storage-partitioned) scans never pack") {
    warehouse
    spark.sql(s"""CREATE TABLE pkcat.spj (k BIGINT, v BIGINT)
      PARTITIONED BY (bucket(4, k))""")
    spark.range(100).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("pk_src")
    spark.sql("INSERT INTO pkcat.spj SELECT * FROM pk_src")
    val plan = spark.sql("SELECT k FROM pkcat.spj")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PackedTasks: keyed"), plan)
  }
}
