package graft

import org.apache.spark.sql.functions._

import graft.operators.TableFormat

/** STORAGE-PARTITIONED JOINS — `SupportsReportPartitioning` over the
  * recorded per-file partition tuples plus the catalog's V2 functions:
  * two tables laid out by the same declared transform join WITHOUT a
  * shuffle (Spark groups co-valued files into co-located tasks), and
  * anything impure — mixed files after compaction, stale-spec tuples —
  * falls back to the ordinary shuffled plan. */
class StoragePartitionedJoinSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_spj").toString
    spark.conf.set("spark.sql.catalog.spjcat",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.spjcat.warehouse", wh)
    wh
  }

  private def withSpj[T](body: => T): T = {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
    }
  }

  private def mkBucketed(name: String, rows: Long, valExpr: String): Unit = {
    spark.sql(s"""CREATE TABLE spjcat.$name (k BIGINT, v BIGINT)
      PARTITIONED BY (bucket(4, k))""")
    spark.range(rows).selectExpr("id AS k", s"$valExpr AS v")
      .createOrReplaceTempView(s"src_$name")
    spark.sql(s"INSERT INTO spjcat.$name SELECT * FROM src_$name")
  }

  test("bucket-partitioned tables join with no shuffle; results exact") {
    warehouse
    mkBucketed("ba", 400, "id * 2")
    mkBucketed("bb", 300, "id * 10")
    // the routed files carry their tuples
    val snapA = TableFormat.snapshot(spark, s"$warehouse/ba")
    assert(snapA.files.nonEmpty)
    assert(snapA.files.forall(_.part.exists(_._1 == "bucket(k, 4)")), snapA.files.map(_.part))
    withSpj {
      val j = spark.sql(
        "SELECT a.k AS k, a.v AS av, b.v AS bv " +
          "FROM spjcat.ba a JOIN spjcat.bb b ON a.k = b.k")
      val rows = j.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(rows.length == 300)
      assert(rows.toSeq == (0L until 300L).map(k => (k, k * 2, k * 10)))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"shuffle in SPJ plan:\n$plan")
      assert(plan.contains("Join"), plan)
    }
  }

  test("identity-partitioned tables co-locate the same way") {
    warehouse
    def mk(name: String): Unit = {
      spark.sql(s"""CREATE TABLE spjcat.$name (k BIGINT, g BIGINT, v BIGINT)
        TBLPROPERTIES('key_col'='k', 'zone_cols'='g',
          '${TableFormat.PartitionSpecProp}'='g')""")
      spark.range(200)
        .selectExpr("id AS k", "id % 5 AS g", "id * 3 AS v")
        .createOrReplaceTempView(s"src_$name")
      spark.sql(s"INSERT INTO spjcat.$name SELECT * FROM src_$name")
    }
    mk("ia"); mk("ib")
    withSpj {
      // join keys == partition keys exactly (Spark's default
      // co-partition check requires full coverage); the GROUP BY on the
      // same key then REUSES the key-grouped layout — the whole plan
      // runs with zero exchanges
      val j = spark.sql(
        "SELECT a.g AS g, count(*) AS n " +
          "FROM spjcat.ia a JOIN spjcat.ib b ON a.g = b.g GROUP BY a.g")
      val rows = j.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(rows.toSeq == (0L until 5L).map(g => (g, 1600L)))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"shuffle in identity SPJ:\n$plan")
    }
  }

  test("compaction mixes partition values: reports Unknown, plan shuffles") {
    warehouse
    mkBucketed("ca", 100, "id")
    mkBucketed("cb", 100, "id")
    TableFormat.compact(spark, s"$warehouse/ca", s"$warehouse/ca/data", 1)
    val snap = TableFormat.snapshot(spark, s"$warehouse/ca")
    assert(snap.files.exists(_.part.isEmpty), snap.files.map(_.part))
    withSpj {
      val j = spark.sql(
        "SELECT a.k AS k FROM spjcat.ca a JOIN spjcat.cb b ON a.k = b.k")
      assert(j.collect().length == 100)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"), s"expected fallback shuffle:\n$plan")
    }
  }

  test("catalog INSERT clusters by the transform: one file per bucket") {
    warehouse
    mkBucketed("wc", 1000, "id")
    val snap = TableFormat.snapshot(spark, s"$warehouse/wc")
    val inserted = snap.files.filter(_.seq == snap.version)
    // clustered-by-transform distribution: every bucket value lands in
    // ONE task — exactly 4 files however many tasks the insert ran
    assert(inserted.size == 4, inserted.map(_.file))
    assert(inserted.flatMap(_.part.map(_._2)).map(_.head).sorted ==
      Seq(0L, 1L, 2L, 3L))
  }

  test("pure layouts also report per-file ordering: the SPJ join drops " +
      "its sorts, not just its exchanges") {
    warehouse
    mkBucketed("oa", 500, "id * 2")
    mkBucketed("ob", 400, "id * 10")
    withSpj {
      val j = spark.sql(
        "SELECT a.k AS k, a.v AS av, b.v AS bv " +
          "FROM spjcat.oa a JOIN spjcat.ob b ON a.k = b.k")
      val rows = j.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(rows.length == 400)
      assert(rows.toSeq == (0L until 400L).map(k => (k, k * 2, k * 10)))
      // string probe ("Sort [" prints for SortExec, not SortMergeJoin —
      // and unlike collect() it sees inside materialized AQE stages)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(!plan.contains("Sort ["),
        s"routed files are pre-sorted by k; SMJ should not re-sort:\n$plan")
    }
  }

  test("a size-rolled bucket (duplicate tuples) withholds the ordering " +
      "report; the join re-sorts and stays exact") {
    warehouse
    spark.sql(s"""CREATE TABLE spjcat.ra (k BIGINT, v BIGINT)
      PARTITIONED BY (bucket(4, k))
      TBLPROPERTIES('write.target-file-size-bytes'='1')""")
    spark.range(600).selectExpr("id AS k", "id * 2 AS v")
      .createOrReplaceTempView("src_ra")
    spark.sql("INSERT INTO spjcat.ra SELECT * FROM src_ra")
    val snap = TableFormat.snapshot(spark, s"$warehouse/ra")
    val tuples = snap.files.flatMap(_.part.map(_._2.toSeq))
    assert(tuples.distinct.size < tuples.size, "fixture must have rolled")
    mkBucketed("rb", 500, "id * 10")
    withSpj {
      val j = spark.sql(
        "SELECT a.k AS k, a.v AS av, b.v AS bv " +
          "FROM spjcat.ra a JOIN spjcat.rb b ON a.k = b.k")
      val rows = j.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(rows.length == 500)
      assert(rows.toSeq == (0L until 500L).map(k => (k, k * 2, k * 10)))
      val plan = j.queryExecution.executedPlan.toString
      // the rolled side's key groups hold >1 file each — concatenation
      // is unsorted, so that side reports no ordering and must re-sort
      // (the pure side keeps its Ordered: true, sort-free read)
      assert(plan.contains("Sort ["), s"expected a fallback sort:\n$plan")
      assert(plan.contains("Ordered: true"), plan)
      assert(plan.contains("Ordered: false"), plan)
    }
  }

  test("a maintenance rewrite drops the sorted marker: tuple-pure but " +
      "unsorted files withhold the ordering report and the join re-sorts") {
    warehouse
    mkBucketed("ma", 500, "id * 2")
    mkBucketed("mb", 400, "id * 10")
    val maRoot = s"$warehouse/ma"
    // the routed INSERT stamped write provenance
    assert(TableFormat.snapshot(spark, maRoot).files.forall(_.sorted))
    // recluster back into one file per bucket value: fileStats re-derives
    // PURE DISTINCT tuples, but the repartition wrote rows in shuffle
    // order — exactly the layout that must NOT report an ordering
    TableFormat.rewriteClustered(spark, maRoot, s"$maRoot/data",
      pmod(col("k"), lit(4)), zoneCols = Seq.empty)
    val snap = TableFormat.snapshot(spark, maRoot)
    val tuples = snap.files.flatMap(_.part.map(_._2.toSeq))
    assert(tuples.nonEmpty && tuples.distinct.size == tuples.size,
      s"fixture must stay tuple-pure+distinct: $tuples")
    assert(snap.files.forall(!_.sorted), "rewrite must drop the marker")
    withSpj {
      val j = spark.sql(
        "SELECT a.k AS k, a.v AS av, b.v AS bv " +
          "FROM spjcat.ma a JOIN spjcat.mb b ON a.k = b.k")
      val rows = j.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(rows.length == 400)
      assert(rows.toSeq == (0L until 400L).map(k => (k, k * 2, k * 10)))
      val plan = j.queryExecution.executedPlan.toString
      // the reclustered side must re-sort (no false ordering claim); the
      // untouched side keeps its sort-free read
      assert(plan.contains("Sort ["), s"expected a fallback sort:\n$plan")
      assert(plan.contains("Ordered: false"), plan)
    }
  }

  test("layout-preserving compaction: bins never span partition values, " +
      "re-sort by the base columns and re-stamp sorted — the sort-free " +
      "SPJ survives maintenance") {
    warehouse
    mkBucketed("sa", 400, "id * 2")
    mkBucketed("sb", 400, "id * 10")
    val saRoot = s"$warehouse/sa"
    // dirty the table: three more routed inserts leave 3 extra small
    // files PER BUCKET (all tuple-pure, all sorted runs)
    (1 to 3).foreach { i =>
      spark.range(400L * i, 400L * (i + 1))
        .selectExpr("id AS k", "id * 2 AS v")
        .createOrReplaceTempView(s"src_sa_$i")
      spark.sql(s"INSERT INTO spjcat.sa SELECT * FROM src_sa_$i")
      spark.sql(s"INSERT INTO spjcat.sb SELECT id AS k, id * 10 AS v " +
        s"FROM range(${400L * i}, ${400L * (i + 1)})")
    }
    assert(TableFormat.snapshot(spark, saRoot).files.size == 16)
    val (snap, nPacked, nBins) =
      TableFormat.compactSmallFiles(spark, saRoot, s"$saRoot/data",
        targetRows = 1000000L)
    val (snapB, _, _) =
      TableFormat.compactSmallFiles(spark, s"$warehouse/sb",
        s"$warehouse/sb/data", targetRows = 1000000L)
    // 16 files → 4 (one per bucket), every output tuple-pure AND
    // sorted-stamped: the bin never crossed a bucket and re-sorted
    assert(nPacked == 16 && nBins == 4, (nPacked, nBins))
    assert(snap.files.size == 4 && snapB.files.size == 4)
    assert(snap.files.forall(_.part.exists(_._1 == "bucket(k, 4)")),
      snap.files.map(_.part))
    assert(snap.files.forall(_.sorted), "compaction must re-stamp sorted")
    // and the physical rows ARE sorted by k within each file
    snap.files.foreach { f =>
      val ks = spark.read.parquet(f.file).select("k").collect()
        .map(_.getLong(0)).toSeq
      assert(ks == ks.sorted, s"${f.file} not sorted")
    }
    withSpj {
      val j = spark.sql(
        "SELECT a.k AS k, a.v AS av, b.v AS bv " +
          "FROM spjcat.sa a JOIN spjcat.sb b ON a.k = b.k")
      val rows = j.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(rows.length == 1600)
      assert(rows.toSeq == (0L until 1600L).map(k => (k, k * 2, k * 10)))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"shuffle after compaction:\n$plan")
      assert(!plan.contains("Sort ["), s"sort after compaction:\n$plan")
    }
  }

  test("compaction under write.sort-order re-sorts bins by the declared " +
      "columns (range clustering preserved) with the marker off; the " +
      "maintenance pre-check matches the tuple-aware binning") {
    warehouse
    spark.sql(s"""CREATE TABLE spjcat.so (k BIGINT, odd BIGINT)
      TBLPROPERTIES('key_col'='k', 'zone_cols'='odd',
        '${TableFormat.SortOrderProp}'='odd')""")
    (0 until 3).foreach { i =>
      spark.sql("INSERT INTO spjcat.so SELECT id AS k, id % 2 AS odd " +
        s"FROM range(${100 * i}, ${100 * (i + 1)})")
    }
    val root = s"$warehouse/so"
    val (snap, _, nBins) = TableFormat.compactSmallFiles(spark, root,
      s"$root/data", targetRows = 1000000L)
    assert(nBins == 1 && snap.files.size == 1)
    assert(snap.files.forall(!_.sorted),
      "declared sort order must keep the provenance marker OFF")
    val odds = spark.read.parquet(snap.files.head.file).select("odd")
      .collect().map(_.getLong(0)).toSeq
    assert(odds == odds.sorted, "bin must sort by the declared order")

    // pre-check parity: a spec'd table whose small files are one per
    // tuple has NO multi-file bin under tuple-aware binning — the tick
    // must commit nothing (before r14 a cross-tuple bin would rewrite)
    spark.sql("""CREATE TABLE spjcat.pc (k BIGINT, v BIGINT)
      PARTITIONED BY (bucket(4, k))""")
    spark.sql("INSERT INTO spjcat.pc SELECT id AS k, id AS v FROM range(40)")
    val pcRoot = s"$warehouse/pc"
    val before = TableFormat.snapshot(spark, pcRoot).version
    val (_, actions) = TableFormat.maintainTable(spark, pcRoot,
      s"$pcRoot/data", targetRows = 1000000L, minSmallFiles = 2)
    assert(!actions.exists(_.startsWith("compact")), actions)
    assert(TableFormat.snapshot(spark, pcRoot).version == before)
  }

  test("the V2 functions are SQL-invocable and match the writers") {
    warehouse
    val r = spark.sql(
      "SELECT spjcat.bucket(4, -7L) AS b, spjcat.div(-7L, 4L) AS d, " +
        "spjcat.months(DATE'2026-03-15') AS m").collect()(0)
    assert(r.getLong(0) == Math.floorMod(-7L, 4L)) // 1, not -3
    assert(r.getLong(1) == Math.floorDiv(-7L, 4L)) // -2, not -1
    assert(r.getLong(2) == (2026 - 1970) * 12 + 2)
  }
}
