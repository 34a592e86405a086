package graft

import graft.operators.TableFormat

/** COST-BASED JOIN REORDER over the catalog's commit statistics — the
  * scan's `estimateStatistics` reports exact row counts, on-disk bytes,
  * and per-column NDV (merged KMV, key + zone columns), null counts and
  * integral bounds; `DataSourceV2Relation.transformV2Stats` hands them
  * to Catalyst, and with `spark.sql.cbo.joinReorder.enabled` the DP
  * reorderer re-orders a star join by ESTIMATED INTERMEDIATE SIZE —
  * the decision a 100 TB fact-dim-dim query lives or dies by. The same
  * honesty rules gate the feed: a pending merge-on-read manifest
  * withholds row counts, and the reorderer then keeps the syntactic
  * order rather than plan on masked figures. */
class CboJoinReorderSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_cbo").toString
    spark.conf.set("spark.sql.catalog.cbocat",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.cbocat.warehouse", wh)
    // fact: 20k rows; cust spans 1000 values, sk spans 20 values
    spark.sql("""CREATE TABLE cbocat.f (k BIGINT, cust BIGINT, sk BIGINT)
      TBLPROPERTIES('key_col'='k', 'zone_cols'='cust,sk')""")
    spark.range(20000).selectExpr("id AS k", "id % 1000 AS cust",
      "id % 20 AS sk").createOrReplaceTempView("cbo_f_src")
    spark.sql("INSERT INTO cbocat.f SELECT * FROM cbo_f_src")
    // mid dim: covers 10% of cust's domain -> f JOIN m ~ 2,000 rows
    spark.sql("CREATE TABLE cbocat.m (mk BIGINT, mv BIGINT) " +
      "TBLPROPERTIES('key_col'='mk')")
    spark.range(100).selectExpr("id AS mk", "id * 7 AS mv")
      .createOrReplaceTempView("cbo_m_src")
    spark.sql("INSERT INTO cbocat.m SELECT * FROM cbo_m_src")
    // small dim: covers 4 of sk's 20 values -> f JOIN s ~ 4,000 rows
    spark.sql("CREATE TABLE cbocat.s (sk2 BIGINT, sv BIGINT) " +
      "TBLPROPERTIES('key_col'='sk2')")
    spark.range(4).selectExpr("id AS sk2", "id * 11 AS sv")
      .createOrReplaceTempView("cbo_s_src")
    spark.sql("INSERT INTO cbocat.s SELECT * FROM cbo_s_src")
    wh
  }

  // SYNTACTICALLY SUBOPTIMAL order: s first (est. 4,000 intermediate),
  // though m first is cheaper (est. 2,000)
  private val starSql =
    "SELECT f.k AS k, m.mv AS mv, s.sv AS sv FROM cbocat.f f " +
      "JOIN cbocat.s s ON f.sk = s.sk2 " +
      "JOIN cbocat.m m ON f.cust = m.mk"

  private def leafOrder(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation =>
        r.relation.identifier.map(_.name).getOrElse("?")
    }

  private def withCbo[T](on: Boolean)(body: => T): T = {
    spark.conf.set("spark.sql.cbo.enabled", on.toString)
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", on.toString)
    try body
    finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    }
  }

  test("commit stats reach Catalyst: rowCount and join-key NDV are the " +
      "recorded figures") {
    warehouse
    withCbo(true) {
      val f = spark.table("cbocat.f")
      val st = f.queryExecution.optimizedPlan.stats
      assert(st.rowCount.contains(BigInt(20000)), st.rowCount)
      val byName = st.attributeStats.map { case (a, cs) => a.name -> cs }
      // KMV at k=64: RMSE ~12.6%; these fixtures are well inside 2.8 sigma
      val ndvCust = byName("cust").distinctCount.get.toLong
      assert(math.abs(ndvCust - 1000L) <= 350, s"cust ndv $ndvCust")
      // below-k cardinalities are EXACT (the sketch holds every value)
      assert(byName("sk").distinctCount.get.toLong == 20L)
      assert(byName("k").nullCount.contains(BigInt(0)))
    }
  }

  test("join reorder flips the star to the cheaper dim first; result " +
      "rows are exact either way") {
    warehouse
    val expected = (0L until 20000L)
      .filter(k => k % 1000 < 100 && k % 20 < 4)
      .map(k => (k, (k % 1000) * 7, (k % 20) * 11)).sorted
    val baseline = withCbo(false)(leafOrder(spark.sql(starSql)))
    assert(baseline == Seq("f", "s", "m"), s"syntactic order: $baseline")
    withCbo(true) {
      val df = spark.sql(starSql)
      assert(leafOrder(df) == Seq("f", "m", "s"),
        s"stats-driven order: ${leafOrder(df)}")
      val rows = df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(rows == expected, s"${rows.length} rows vs ${expected.length}")
    }
  }

  test("a pending merge-on-read manifest withholds row counts and the " +
      "reorderer keeps the syntactic order (honesty gate)") {
    warehouse
    // clone the fact and publish one equality-delete manifest
    TableFormat.cloneTable(spark, s"$warehouse/f", s"$warehouse/fmor")
    TableFormat.deleteKeysMoR(spark, s"$warehouse/fmor",
      s"$warehouse/fmor/data", spark.range(1).selectExpr("id AS k"))
    withCbo(true) {
      val st = spark.table("cbocat.fmor").queryExecution.optimizedPlan.stats
      assert(st.rowCount.isEmpty, s"masked rows must not be counted: $st")
      val df = spark.sql(starSql.replace("cbocat.f f", "cbocat.fmor f"))
      assert(leafOrder(df) == Seq("fmor", "s", "m"),
        s"without row counts the order must stay syntactic: ${leafOrder(df)}")
    }
  }
}
