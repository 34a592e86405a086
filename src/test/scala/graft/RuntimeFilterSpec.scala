package graft

import org.apache.spark.sql.functions._

import graft.operators.TableFormat

/** Runtime (join-driven) FILE pruning through the SQL catalog —
  * `SupportsRuntimeFiltering`: Spark's dynamic-partition-pruning rule
  * collects the build side's join-key values at execution time and
  * hands them to the scan as an `In` filter, which probes each file's
  * key bounds AND commit bloom (no false negatives) — so a selective
  * dim filter prunes fact files the WHERE clause never named. */
class RuntimeFilterSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_rtf").toString
    spark.conf.set("spark.sql.catalog.rfcat",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.rfcat.warehouse", wh)
    wh
  }

  /** 8 files sliced by key RESIDUE mod 8 — every file spans the full
    * key range, so bounds can never discriminate: any file pruning is
    * bloom evidence or nothing. */
  private lazy val factRoot: String = {
    val root = s"$warehouse/fact"
    import spark.implicits._
    val base = (0L until 800L).map(k => (k, k * 1.0)).toDF("k", "v")
    val files = (0 until 8).flatMap { r =>
      base.filter(pmod(col("k"), lit(8)) === r)
        .repartition(1).write.mode("overwrite").parquet(s"$root/r$r")
      TableFormat.listParquet(spark, s"$root/r$r")
    }
    TableFormat.commitFiles(spark, root, "k", files, 1 << 14, 5)
    root
  }

  /** A FILE-BACKED dim (a local relation would constant-fold its filter
    * away, and DPP requires a surviving selective predicate on the
    * build side). */
  private lazy val dimPath: String = {
    import spark.implicits._
    val p = s"$warehouse/dim_src"
    ((0L until 64L).map(i => (i * 8L + 3L, i % 13L)) ++
      Seq((5000L, 99L), (6000L, 99L)))
      .toDF("dk", "grp").repartition(1).write.mode("overwrite").parquet(p)
    p
  }

  test("a selective dim filter runtime-prunes fact files via the blooms") {
    factRoot
    // dim keys all share residue 3: only the r=3 file can hold matches
    val dim = spark.read.parquet(dimPath)
      .filter(col("grp") === 2L) // the selective predicate DPP requires
    val joined = spark.table("rfcat.fact").join(dim, col("k") === col("dk"))
      .select(col("k"), col("v"))
    val rows = joined.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(rows.toSeq == Seq(19L, 123L, 227L, 331L, 435L).map(k => (k, k * 1.0)))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"no DPP subquery in:\n$plan")
    val m = "RuntimeFiltered: (\\d+)/(\\d+)".r.findFirstMatchIn(plan)
      .getOrElse(fail(s"no RuntimeFiltered marker in:\n$plan"))
    assert(m.group(2).toInt == 8, plan)
    // 7 of 8 files dropped at runtime (bloom false positives could in
    // principle keep an extra file; never fewer than 6 of 8)
    assert(m.group(1).toInt >= 6, plan)
  }

  test("results identical with runtime filtering disabled") {
    factRoot
    import spark.implicits._
    val dim = Seq(5L, 13L, 21L).toDF("dk").filter(col("dk") < 1000)
    def run(): Seq[(Long, Double)] =
      spark.table("rfcat.fact").join(dim, col("k") === col("dk"))
        .select(col("k"), col("v")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    val on = run()
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled",
      "false")
    try {
      val off = run()
      assert(on == off)
    } finally spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
  }

  test("an empty runtime key set prunes every file; zero rows, no error") {
    factRoot
    val dim = spark.read.parquet(dimPath).filter(col("grp") === 99L)
    val joined = spark.table("rfcat.fact").join(dim, col("k") === col("dk"))
    assert(joined.count() == 0L)
  }

  test("runtime EqualTo / zone-column In shapes prune through bounds") {
    // direct unit probe of Scan.filter — no join machinery: zone-bounds
    // path (files keyed by RANGE so bounds discriminate)
    val root = s"$warehouse/zoned"
    import spark.implicits._
    val files = (0 until 4).flatMap { b =>
      (0L until 50L).map(i => (b * 100L + i, b.toLong)).toDF("k", "z")
        .repartition(1).write.mode("overwrite").parquet(s"$root/b$b")
      TableFormat.listParquet(spark, s"$root/b$b")
    }
    TableFormat.commitFiles(spark, root, "k", files, 1 << 12, 5,
      zoneCols = Seq("z"))
    (0L until 4L).map(i => (i, i)).toDF("dz", "g")
      .repartition(1).write.mode("overwrite").parquet(s"$root/dim")
    val dim = spark.read.parquet(s"$root/dim").filter(col("g") === 2L)
    val joined = spark.table("rfcat.zoned").join(dim, col("z") === col("dz"))
      .select(col("k"), col("z"))
    // execute THIS df (count() would build a separate query execution
    // whose runtime filters never fire on `joined`'s own scan instance)
    assert(joined.collect().length == 50)
    val plan = joined.queryExecution.executedPlan.toString
    val m = "RuntimeFiltered: (\\d+)/(\\d+)".r.findFirstMatchIn(plan)
      .getOrElse(fail(s"no RuntimeFiltered marker in:\n$plan"))
    assert(m.group(1).toInt == 3 && m.group(2).toInt == 4, plan)
  }
}
