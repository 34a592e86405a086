package graft

import org.apache.spark.sql.functions._

import graft.operators.TableFormat

/** COLUMN MAPPING over KEY/ZONE columns + TABLE RENAME — the r14
  * extensions of the rename/drop ledger: per-file stats re-key through
  * the mapping at snapshot resolution, so renaming the key or a zone
  * column keeps pruning, blooms and storage-partitioned joins intact;
  * renameTable moves the root and rewrites the log's absolute paths. */
class KeyRenameSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_krn").toString
    spark.conf.set("spark.sql.catalog.krcat",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.krcat.warehouse", wh)
    wh
  }

  test("renaming the key of a bucket-partitioned table keeps the SPJ " +
      "layout, file pruning and blooms working") {
    warehouse
    def mk(name: String): Unit = {
      spark.sql(s"""CREATE TABLE krcat.$name (k BIGINT, v BIGINT)
        PARTITIONED BY (bucket(4, k))""")
      spark.range(400).selectExpr("id AS k", "id * 3 AS v")
        .createOrReplaceTempView(s"krn_src_$name")
      spark.sql(s"INSERT INTO krcat.$name SELECT * FROM krn_src_$name")
    }
    mk("ra"); mk("rb")
    spark.sql("ALTER TABLE krcat.ra RENAME COLUMN k TO id")
    // stats re-keyed: the point probe prunes through the bloom and hits
    val probe = spark.sql("SELECT id, v FROM krcat.ra WHERE id = 37")
    assert(probe.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((37L, 111L)))
    assert(probe.queryExecution.executedPlan.toString.contains("PrunedFiles: 3/4"),
      probe.queryExecution.executedPlan.toString)
    // the partition spec followed the rename; tuples stay engaged: the
    // equal-transform join still plans EXCHANGE-FREE
    val snap = TableFormat.snapshot(spark, s"$warehouse/ra")
    assert(snap.props(TableFormat.PartitionSpecProp) == "bucket(id, 4)")
    assert(snap.files.forall(_.part.exists(_._1 == "bucket(id, 4)")),
      snap.files.map(_.part))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql("SELECT a.id AS k, a.v AS av, b.v AS bv " +
        "FROM krcat.ra a JOIN krcat.rb b ON a.id = b.k")
      val rows = j.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(rows.length == 400)
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        j.queryExecution.executedPlan.toString)
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
    }
    // time travel shows the OLD name with working stats
    val v2 = TableFormat.snapshot(spark, s"$warehouse/ra", Some(2))
    assert(v2.keyCol == "k")
    assert(org.apache.spark.sql.types.StructType.fromDDL(v2.schemaDdl.get)
      .fieldNames.head == "k")
  }

  test("renaming a zone column keeps its bounds pruning; metadata " +
      "aggregates answer under the new name") {
    warehouse
    spark.sql("""CREATE TABLE krcat.zr (k BIGINT, score BIGINT)
      TBLPROPERTIES('key_col'='k', 'zone_cols'='score')""")
    spark.range(300).selectExpr("id AS k", "id % 100 AS score")
      .createOrReplaceTempView("krn_zr_src")
    spark.sql("INSERT INTO krcat.zr SELECT * FROM krn_zr_src")
    spark.sql("ALTER TABLE krcat.zr RENAME COLUMN score TO quality")
    val snap = TableFormat.snapshot(spark, s"$warehouse/zr")
    assert(snap.zoneCols == Seq("quality"))
    assert(snap.files.forall(_.zones.contains("quality")), snap.files)
    assert(spark.sql("SELECT count(*) FROM krcat.zr WHERE quality < 10")
      .collect()(0).getLong(0) == 30)
    // the metadata min/max pushdown works against the re-keyed bounds
    val mx = spark.sql("SELECT max(quality) AS m FROM krcat.zr")
    assert(mx.queryExecution.executedPlan.toString.contains("max_quality"),
      mx.queryExecution.executedPlan.toString)
    assert(mx.collect()(0).getLong(0) == 99)
  }

  test("a constraint referencing the renamed column refuses the rename") {
    warehouse
    spark.sql("""CREATE TABLE krcat.cg (k BIGINT, amt BIGINT)
      TBLPROPERTIES('key_col'='k', 'constraint.pos_amt'='amt >= 0')""")
    spark.range(5).selectExpr("id AS k", "id AS amt")
      .createOrReplaceTempView("krn_cg_src")
    spark.sql("INSERT INTO krcat.cg SELECT * FROM krn_cg_src")
    val e = intercept[Exception](
      spark.sql("ALTER TABLE krcat.cg RENAME COLUMN amt TO amount"))
    assert(e.getMessage.contains("constraint"), e.getMessage)
  }

  test("renameTable moves the root, rewrites logged paths, and keeps " +
      "history, vectors and time travel intact") {
    warehouse
    spark.sql("CREATE TABLE krcat.told (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES('key_col'='k')")
    spark.range(100).selectExpr("id AS k", "id * 2 AS v")
      .createOrReplaceTempView("krn_mv_src")
    spark.sql("INSERT INTO krcat.told SELECT * FROM krn_mv_src")      // v2
    TableFormat.deletePositions(spark, s"$warehouse/told",
      s"$warehouse/told/data", col("k") === 5)                        // v3 (dv)
    spark.sql("ALTER TABLE krcat.told RENAME TO tnew")
    assert(spark.sql("SELECT count(*) FROM krcat.tnew").collect()(0)
      .getLong(0) == 99)
    // history + time travel survive under the new name
    assert(TableFormat.versions(spark, s"$warehouse/tnew") == Seq(1L, 2L, 3L))
    assert(TableFormat.read(spark,
      TableFormat.snapshot(spark, s"$warehouse/tnew", Some(2)))
      .count() == 100)
    // every rewritten path resolves under the new root
    val snap = TableFormat.snapshot(spark, s"$warehouse/tnew")
    assert(snap.files.forall(_.file.contains("/tnew/")), snap.files.map(_.file))
    assert(snap.files.flatMap(_.dv.map(_._1)).forall(_.contains("/tnew/")))
    // the old name is gone; occupied targets refuse
    intercept[Exception](spark.sql("SELECT * FROM krcat.told").collect())
    spark.sql("CREATE TABLE krcat.tblock (k BIGINT) TBLPROPERTIES('key_col'='k')")
    intercept[Exception](
      spark.sql("ALTER TABLE krcat.tnew RENAME TO tblock"))
  }
}
