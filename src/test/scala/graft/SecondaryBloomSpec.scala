package graft

import org.apache.spark.sql.functions._

import graft.operators.TableFormat

/** SECONDARY-COLUMN BLOOMS — `bloom.cols` zone columns carry per-file
  * membership bitsets in commit stats: point/IN probes on a
  * high-cardinality non-key column prune files whose wide bounds never
  * could; pre-declaration files fall back to bounds (never a false
  * prune); the declaration must name declared zone columns. */
class SecondaryBloomSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_sbl").toString
    spark.conf.set("spark.sql.catalog.sblcat",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.sblcat.warehouse", wh)
    wh
  }

  test("equality and IN probes on a bloomed zone column prune files; " +
      "results exact; pre-declaration files keep bounds-only pruning") {
    warehouse
    spark.sql(s"""CREATE TABLE sblcat.eb (ts BIGINT, usr BIGINT)
      TBLPROPERTIES('key_col'='ts', 'zone_cols'='usr',
        'bloom.cols'='usr', 'num_bits'='${1 << 16}',
        '${TableFormat.PartitionSpecProp}'='div(ts, 100)')""")
    // usr is a full-domain permutation per 100-row window: bounds overlap
    // everywhere, only membership can prune
    spark.range(400).selectExpr("id AS ts", "(id * 37) % 400 AS usr")
      .createOrReplaceTempView("sbl_src")
    spark.sql("INSERT INTO sblcat.eb SELECT * FROM sbl_src")
    val snap = TableFormat.snapshot(spark, s"$warehouse/eb")
    assert(snap.files.size == 4 && snap.files.forall(_.blooms.contains("usr")))
    // ts=250 -> usr=(250*37)%400=50 lives in exactly one file
    val eq = spark.sql("SELECT ts FROM sblcat.eb WHERE usr = 50")
    assert(eq.collect().map(_.getLong(0)).toSeq == Seq(250L))
    assert(eq.queryExecution.executedPlan.toString.contains("PrunedFiles: 3/4"),
      eq.queryExecution.executedPlan.toString)
    // IN hitting two files (ts=250 -> usr=50; ts=10 -> usr=370) prunes
    // the other two
    val in = spark.sql("SELECT ts FROM sblcat.eb WHERE usr IN (50, 370)")
    assert(in.collect().map(_.getLong(0)).sorted.toSeq == Seq(10L, 250L))
    assert(in.queryExecution.executedPlan.toString.contains("PrunedFiles: 2/4"),
      in.queryExecution.executedPlan.toString)
    // blooms survive the commit JSON round-trip bit-exactly
    val f0 = snap.files.head
    assert(TableFormat.snapshot(spark, s"$warehouse/eb").files.head
      .blooms("usr").sameElements(f0.blooms("usr")))
  }

  test("write.delete.mode=merge-on-read routes key IN/= deletes to a " +
      "manifest commit; ranges keep metadata drops; default keeps " +
      "copy-on-write") {
    warehouse
    spark.sql(s"""CREATE TABLE sblcat.dm (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k',
        '${TableFormat.DeleteModeProp}'='merge-on-read')""")
    spark.range(200).selectExpr("id AS k", "id * 2 AS v")
      .createOrReplaceTempView("dm_src")
    spark.sql("INSERT INTO sblcat.dm SELECT * FROM dm_src")          // v2
    spark.sql("DELETE FROM sblcat.dm WHERE k IN (3, 77, 150)")       // v3
    val v3 = TableFormat.snapshot(spark, s"$warehouse/dm")
    assert(v3.op.contains("mor-delete") && v3.deletes.map(_.nKeys).sum == 3,
      s"${v3.op} ${v3.deletes}")
    assert(spark.sql("SELECT count(*) FROM sblcat.dm").collect()(0)
      .getLong(0) == 197)
    // a RANGE delete under the same property keeps the metadata path
    spark.sql("DELETE FROM sblcat.dm WHERE k >= 190")                // v4
    val v4 = TableFormat.snapshot(spark, s"$warehouse/dm")
    assert(v4.op.contains("delete") && !v4.op.contains("mor-delete"), v4.op)
    assert(spark.sql("SELECT count(*) FROM sblcat.dm").collect()(0)
      .getLong(0) == 187)
    // WITHOUT the property, the same IN delete is copy-on-write: no
    // manifest appears
    spark.sql("CREATE TABLE sblcat.dc (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES('key_col'='k')")
    spark.sql("INSERT INTO sblcat.dc SELECT * FROM dm_src")
    spark.sql("DELETE FROM sblcat.dc WHERE k IN (3, 77)")
    val dc = TableFormat.snapshot(spark, s"$warehouse/dc")
    assert(dc.deletes.isEmpty, dc.deletes)
    assert(spark.sql("SELECT count(*) FROM sblcat.dc").collect()(0)
      .getLong(0) == 198)
  }

  test("bloom.cols must name declared zone columns (loud at stats time)") {
    warehouse
    spark.sql("""CREATE TABLE sblcat.bad (ts BIGINT, usr BIGINT)
      TBLPROPERTIES('key_col'='ts', 'bloom.cols'='usr')""")
    spark.range(10).selectExpr("id AS ts", "id AS usr")
      .createOrReplaceTempView("sbl_bad_src")
    val e = intercept[Exception](
      spark.sql("INSERT INTO sblcat.bad SELECT * FROM sbl_bad_src"))
    assert(e.getMessage != null &&
      e.getMessage.contains("zone columns"), e.getMessage)
  }
}
