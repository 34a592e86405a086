package graft

import org.apache.spark.sql.functions._

import graft.operators.TableFormat

/** Plan-time statistics from commit metadata — `SupportsReportStatistics`:
  * the scan reports the pruned survivors' recorded on-disk bytes and
  * exact row counts, so Catalyst's broadcast decision sees a graft
  * table's true footprint instead of the never-broadcast DSv2 default. */
class ReportStatisticsSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_stats").toString
    spark.conf.set("spark.sql.catalog.stcat",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.stcat.warehouse", wh)
    wh
  }

  private def commitKv(name: String, slices: Seq[Range]): String = {
    import spark.implicits._
    val root = s"$warehouse/$name"
    val files = slices.zipWithIndex.flatMap { case (r, i) =>
      r.map(k => (k.toLong, k * 1.0)).toDF("k", "v")
        .repartition(1).write.mode("overwrite").parquet(s"$root/s$i")
      TableFormat.listParquet(spark, s"$root/s$i")
    }
    TableFormat.commitFiles(spark, root, "k", files, 1 << 12, 5)
    root
  }

  private def leafStats(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
        if r.scan.description().startsWith("graft(") => r.stats
    }.head

  test("commit stats surface as exact rowCount and true byte size") {
    val root = commitKv("dim", Seq(0 until 100, 100 until 300))
    val snap = TableFormat.snapshot(spark, root)
    assert(snap.files.forall(_.bytes > 0))
    val st = leafStats(spark.table("stcat.dim"))
    assert(st.rowCount.contains(BigInt(300)), st)
    assert(st.sizeInBytes == BigInt(snap.files.map(_.bytes).sum), st)
  }

  test("statistics reflect plan-time file pruning") {
    commitKv("pruned", Seq(0 until 100, 1000 until 1100, 2000 until 2100))
    val full = leafStats(spark.table("stcat.pruned"))
    val probe = leafStats(
      spark.table("stcat.pruned").filter(col("k") >= 2000))
    assert(probe.rowCount.contains(BigInt(100)), probe)
    assert(probe.sizeInBytes < full.sizeInBytes, s"$probe vs $full")
  }

  test("a small graft table auto-broadcasts; below-threshold flips to SMJ") {
    commitKv("bdim", Seq(0 until 50))
    import spark.implicits._
    val fact = spark.range(0, 500000).select(col("id").as("fk"))
      .repartition(4)
    def planOf(threshold: String): String = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      try {
        val j = fact.join(spark.table("stcat.bdim"), col("fk") === col("k"))
        j.collect()
        j.queryExecution.executedPlan.toString
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
    }
    // dim is a few KB: above threshold it broadcasts WITHOUT a hint —
    // only possible because the scan reports its true size
    val bhj = planOf("1MB")
    assert(bhj.contains("BroadcastHashJoin"), bhj)
    // starve the threshold below the dim's real size: the SAME join
    // must fall back to a shuffle join — the stats drive both decisions
    val smj = planOf("1")
    assert(!smj.contains("BroadcastHashJoin"), smj)
  }

  test("column statistics: KMV ndv, recorded nulls, integral bounds") {
    import spark.implicits._
    val root = s"$warehouse/cstats"
    (0L until 300L).map(k =>
        (k, if (k % 3 == 0) None else Some(k * 2)))
      .toDF("k", "z").repartition(2)
      .write.mode("overwrite").parquet(s"$root/d0")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/d0"), 1 << 12, 5,
      zoneCols = Seq("z"))
    val rel = spark.table("stcat.cstats").queryExecution.optimizedPlan
      .collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.head
    val cs = rel.scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics().columnStats()
    import scala.jdk.CollectionConverters._
    val byName = cs.asScala.map { case (ref, st) =>
      ref.fieldNames()(0) -> st
    }.toMap
    val k = byName("k"); val z = byName("z")
    assert(k.nullCount().getAsLong == 0L)
    assert(z.nullCount().getAsLong == 100L)
    assert(k.min().get() == java.lang.Long.valueOf(0L) &&
      k.max().get() == java.lang.Long.valueOf(299L))
    assert(z.min().get() == java.lang.Long.valueOf(2L) &&
      z.max().get() == java.lang.Long.valueOf(598L))
    val ndv = k.distinctCount().getAsLong
    assert(math.abs(ndv - 300L) <= 45, s"ndv=$ndv") // KMV k=64 ~13%
    // zone columns carry their own KMV sketches (r14): 200 non-null
    // distinct values, nulls excluded from the sketch by construction
    val zndv = z.distinctCount().getAsLong
    assert(math.abs(zndv - 200L) <= 70, s"zone ndv=$zndv")
  }

  test("numRows refused under pending merge-on-read manifests") {
    val root = commitKv("mor", Seq(0 until 100))
    TableFormat.deleteKeysMoR(spark, root, root, Seq(3L, 7L))
    val st = leafStats(spark.table("stcat.mor"))
    assert(st.rowCount.isEmpty, st)
    assert(st.sizeInBytes > 0 &&
      st.sizeInBytes < BigInt(Long.MaxValue) / 4, st)
  }
}
