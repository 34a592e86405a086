package graft

import org.apache.spark.sql.functions._

import graft.operators.TableFormat

class GraftCatalogSpec extends SparkTestBase {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_cat_sql").toString

  private def writeKv(pairs: Seq[(Long, Double)], path: String): String = {
    import spark.implicits._
    pairs.toDF("k", "v").repartition(1).write.mode("overwrite").parquet(path)
    path
  }

  // one warehouse + catalog registration for the whole suite: Spark
  // caches catalog instances per session, so the conf must be stable
  private lazy val warehouse: String = {
    val wh = freshRoot()
    spark.conf.set("spark.sql.catalog.sqlcat",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.sqlcat.warehouse", wh)
    wh
  }

  test("SQL reads, VERSION AS OF time travel, MoR masks applied in-reader") {
    val root = s"$warehouse/sales"
    writeKv((1L to 10L).map(i => (i, i * 1.0)), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)       // v1
    TableFormat.deleteKeysMoR(spark, root, root, Seq(3L, 7L))    // v2
    writeKv(Seq(3L -> 33.0, 20L -> 20.0), s"$root/w2")
    TableFormat.appendFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/w2"))               // v3
    def keys(sql: String) = spark.sql(sql).orderBy("k").collect()
      .map(_.getLong(0)).toSeq
    // latest: the v2 manifest masks 3/7 in the v1 file, the v3 re-append
    // of k=3 is NEWER than the manifest (seq rule) and visible
    assert(keys("SELECT k FROM sqlcat.sales") ==
      Seq(1L, 2L, 3L, 4L, 5L, 6L, 8L, 9L, 10L, 20L))
    assert(keys("SELECT k FROM sqlcat.sales VERSION AS OF 1") == (1L to 10L))
    assert(keys("SELECT k FROM sqlcat.sales VERSION AS OF 2") ==
      Seq(1L, 2L, 4L, 5L, 6L, 8L, 9L, 10L))
    // aggregates compose; the masked rows never reach Spark
    assert(spark.sql("SELECT sum(v) AS s FROM sqlcat.sales VERSION AS OF 2")
      .collect()(0).getDouble(0) == (1 to 10).filterNot(Set(3, 7)).sum.toDouble)
    // a missing table is a loud NoSuchTable, not an empty frame
    val e = intercept[Exception](spark.sql("SELECT * FROM sqlcat.nope").collect())
    assert(e.getMessage.toLowerCase.contains("table"))
  }

  test("key-range filters prune files with driver arithmetic; results stay exact") {
    val root = s"$warehouse/clustered"
    val files = Seq(0, 1, 2, 3).flatMap { b =>
      writeKv((0L until 100L).map(i => (b * 1000L + i, i * 1.0)), s"$root/f$b")
      TableFormat.listParquet(spark, s"$root/f$b")
    }
    TableFormat.commitFiles(spark, root, "k", files, 1024, 3)
    val df = spark.sql(
      "SELECT k, v FROM sqlcat.clustered WHERE k >= 2000 AND k <= 2050")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PrunedFiles: 3/4"), plan)
    assert(df.orderBy("k").collect().map(_.getLong(0)).toSeq ==
      (2000L to 2050L))
    // column pruning reaches the reader
    val narrow = spark.sql("SELECT v FROM sqlcat.clustered WHERE k = 1005")
    val nplan = narrow.queryExecution.executedPlan.toString
    assert(nplan.contains("PrunedFiles: 3/4"), nplan)
    assert(narrow.collect().map(_.getDouble(0)).toSeq == Seq(5.0))
    // a query with no key predicate reads everything, exactly once
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.clustered")
      .collect()(0).getLong(0) == 400L)
  }

  test("metadata tables ($history/$files) and TIMESTAMP AS OF through SQL") {
    val root = s"$warehouse/metat"
    writeKv((1L to 10L).map(i => (i, i * 1.0)), s"$root/w1")
    writeKv((11L to 20L).map(i => (i, i * 1.0)), s"$root/w2")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1") ++
        TableFormat.listParquet(spark, s"$root/w2"), 256, 3)     // v1
    TableFormat.deleteKeysMoR(spark, root, root, Seq(5L, 15L))   // v2
    TableFormat.compact(spark, root, root, 1)                    // v3
    val hist = spark.sql(
      "SELECT version, op, n_files, n_delete_files, meta_rows " +
        "FROM sqlcat.`metat$history` ORDER BY version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // v2's meta_rows is stale BY CONTRACT (stats say 20 under a manifest)
    assert(hist == Seq((1L, "append", 2L, 0L, 20L),
      (2L, "mor-delete", 2L, 1L, 20L), (3L, "replace", 1L, 0L, 18L)))
    val files1 = spark.sql(
      "SELECT count(*) AS n, sum(n_rows) AS r " +
        "FROM sqlcat.`metat$files` VERSION AS OF 1").collect()(0)
    assert((files1.getLong(0), files1.getLong(1)) == ((2L, 20L)))
    // TIMESTAMP AS OF in the future resolves to the head
    val future = new java.sql.Timestamp(System.currentTimeMillis + 60000)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM sqlcat.metat TIMESTAMP AS OF '$future'")
      .collect()(0).getLong(0) == 18L)
    // unknown metadata suffix is a loud NoSuchTable
    val e = intercept[Exception](
      spark.sql("SELECT * FROM sqlcat.`metat$bogus`").collect())
    assert(e.getMessage.toLowerCase.contains("table"))
  }

  test("VERSION AS OF resolves named refs (tags) next to numeric pins") {
    val root = s"$warehouse/tagged"
    writeKv((1L to 5L).map(i => (i, i * 1.0)), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)       // v1
    TableFormat.createTag(spark, root, "prod")                   // v2, pins v1
    writeKv(Seq(6L -> 6.0), s"$root/w2")
    TableFormat.appendFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/w2"))               // v3
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.tagged VERSION AS OF 'prod'")
      .collect()(0).getLong(0) == 5L)
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.tagged")
      .collect()(0).getLong(0) == 6L)
    // tags compose with metadata tables
    assert(spark.sql(
      "SELECT count(*) AS n FROM sqlcat.`tagged$files` VERSION AS OF 'prod'")
      .collect()(0).getLong(0) == 1L)
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM sqlcat.tagged VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("no tag"))
  }

  test("schema evolution: SQL sees the committed DDL with null back-fill") {
    import spark.implicits._
    val root = s"$warehouse/evolving"
    writeKv(Seq(1L -> 1.0), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)
    Seq((2L, 2.0, "tag")).toDF("k", "v", "t").repartition(1)
      .write.mode("overwrite").parquet(s"$root/w2")
    TableFormat.appendFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/w2"))
    val got = spark.sql("SELECT k, t FROM sqlcat.evolving ORDER BY k")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(got == Seq((1L, None), (2L, Some("tag"))))
    // the v1 pin keeps the v1 schema: no column t there
    val cols = spark.sql("SELECT * FROM sqlcat.evolving VERSION AS OF 1").columns
    assert(cols.toSeq == Seq("k", "v"))
  }

  test("strict bound on a double zone column never false-prunes (trunc-conservative)") {
    import spark.implicits._
    val root = s"$warehouse/scored"
    // two files by score range: [0.1..0.9] casts to long bounds [0,0],
    // [1.1..1.9] to [1,1] — `score > 0.5` must keep the first file (its
    // 0.7 matches) even though 0.5+1 = 1 would prune it
    Seq((1L, 0.1), (2L, 0.7), (3L, 0.9)).toDF("k", "score")
      .repartition(1).write.mode("overwrite").parquet(s"$root/lo")
    Seq((4L, 1.1), (5L, 1.9)).toDF("k", "score")
      .repartition(1).write.mode("overwrite").parquet(s"$root/hi")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/lo") ++
        TableFormat.listParquet(spark, s"$root/hi"),
      256, 3, zoneCols = Seq("score"))
    val got = spark.sql(
      "SELECT k FROM sqlcat.scored WHERE score > 0.5 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 3L, 4L, 5L))
    // integral strict bounds still tighten exactly: k > 3 reads 1 of 2 files
    val df = spark.sql("SELECT k FROM sqlcat.scored WHERE k > 3")
    val m = "PrunedFiles: (\\d+)/(\\d+)".r
      .findFirstMatchIn(df.queryExecution.executedPlan.toString)
    assert(m.exists(x => x.group(1) == "1" && x.group(2) == "2"),
      s"expected 1/2 pruned: ${df.queryExecution.executedPlan.toString}")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(4L, 5L))
  }

  test("SQL write path: CREATE TABLE, INSERT INTO, CTAS, constraint refusal, INSERT OVERWRITE") {
    spark.sql("""CREATE TABLE sqlcat.wt (k BIGINT, v DOUBLE)
      TBLPROPERTIES('key_col'='k', 'constraint.pos_v'='v > 0')""")
    val root = s"$warehouse/wt"
    assert(TableFormat.versions(spark, root) == Seq(1L)) // empty bootstrap
    spark.sql("INSERT INTO sqlcat.wt VALUES (1, 1.0), (2, 2.0)")   // v2
    spark.sql("INSERT INTO sqlcat.wt VALUES (3, 3.5)")             // v3
    def sums(q: String) = spark.sql(q).collect()(0)
    assert(sums("SELECT count(*) AS n, sum(v) AS s FROM sqlcat.wt")
      .getLong(0) == 3L)
    // per-version time travel over the SQL-written commits
    assert(sums("SELECT count(*) AS n FROM sqlcat.wt VERSION AS OF 1").getLong(0) == 0L)
    assert(sums("SELECT count(*) AS n FROM sqlcat.wt VERSION AS OF 2").getLong(0) == 2L)
    // the TBLPROPERTIES constraint REFUSES a violating INSERT at commit
    val e = intercept[Exception](
      spark.sql("INSERT INTO sqlcat.wt VALUES (4, -1.0)"))
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(e).contains("pos_v"), rootMsg(e))
    assert(TableFormat.versions(spark, root) == Seq(1L, 2L, 3L)) // nothing landed
    assert(sums("SELECT count(*) AS n FROM sqlcat.wt").getLong(0) == 3L)
    // INSERT OVERWRITE truncates-and-loads in ONE commit; history survives
    spark.sql("INSERT OVERWRITE sqlcat.wt VALUES (9, 9.0), (10, 10.0)") // v4
    assert(spark.sql("SELECT k FROM sqlcat.wt ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(9L, 10L))
    assert(sums("SELECT count(*) AS n FROM sqlcat.wt VERSION AS OF 3").getLong(0) == 3L)
    val head = TableFormat.snapshot(spark, root)
    assert(head.op.contains("overwrite") && head.version == 4L)
    // CTAS: create + append through the same commit path
    spark.sql("""CREATE TABLE sqlcat.ct TBLPROPERTIES('key_col'='k')
      AS SELECT k, v * 2 AS v2 FROM sqlcat.wt""")
    assert(spark.sql("SELECT sum(v2) AS s FROM sqlcat.ct").collect()(0)
      .getDouble(0) == 38.0)
    assert(TableFormat.snapshot(spark, s"$warehouse/ct").keyCol == "k")
    // duplicate CREATE refuses; DROP removes and recreate works
    val dup = intercept[Exception](spark.sql("CREATE TABLE sqlcat.ct (k BIGINT) TBLPROPERTIES('key_col'='k')"))
    assert(rootMsg(dup).toLowerCase.contains("exists"), rootMsg(dup))
    spark.sql("DROP TABLE sqlcat.ct")
    val gone = intercept[Exception](spark.sql("SELECT * FROM sqlcat.ct").collect())
    assert(rootMsg(gone).toLowerCase.contains("table"), rootMsg(gone))
  }

  test("date/timestamp columns: SQL round-trip, date-zone pruning, streaming reader") {
    import org.apache.spark.sql.functions._
    val root = s"$warehouse/dated"
    // two files split by date range; d is a DATE zone column, ts TIMESTAMP
    val base = spark.range(1, 21).select(col("id").as("k"),
      date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        col("id").cast("int")).as("d"),
      to_timestamp(lit("2024-06-01 08:30:00")).as("ts"))
    base.filter(col("k") <= 10).repartition(1)
      .write.mode("overwrite").parquet(s"$root/w1")
    base.filter(col("k") > 10).repartition(1)
      .write.mode("overwrite").parquet(s"$root/w2")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1") ++
        TableFormat.listParquet(spark, s"$root/w2"),
      256, 3, zoneCols = Seq("d", "ts"))
    // values round-trip through the custom row reader
    val got = spark.sql(
      "SELECT k, d, ts FROM sqlcat.dated WHERE k IN (1, 20) ORDER BY k").collect()
    assert(got(0).getDate(1) == java.sql.Date.valueOf("2024-01-02"))
    assert(got(1).getDate(1) == java.sql.Date.valueOf("2024-01-21"))
    assert(got(0).getTimestamp(2) ==
      java.sql.Timestamp.valueOf("2024-06-01 08:30:00"))
    // a date predicate PRUNES files from the zone stats (w1 covers
    // 01-02..01-11, w2 01-12..01-21): > 2024-01-11 reads only w2
    val df = spark.sql(
      "SELECT k FROM sqlcat.dated WHERE d > DATE'2024-01-11'")
    val m = "PrunedFiles: (\\d+)/(\\d+)".r
      .findFirstMatchIn(df.queryExecution.executedPlan.toString)
    assert(m.exists(x => x.group(1) == "1" && x.group(2) == "2"),
      df.queryExecution.executedPlan.toString)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == (11L to 20L))
    // the streaming source delivers the same typed values
    val out = java.nio.file.Files.createTempDirectory("graft_dt_out").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_dt_cp").toString
    val q = spark.readStream.format("graft-table-changes").load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    val sgot = spark.read.parquet(out).orderBy("k").collect()
    assert(sgot.length == 20)
    assert(sgot(0).getDate(1) == java.sql.Date.valueOf("2024-01-02"))
    assert(sgot(19).getTimestamp(2) ==
      java.sql.Timestamp.valueOf("2024-06-01 08:30:00"))
  }

  test("vectorized scan: clean AND MoR-pending snapshots plan Columnar=true, count(*) and evolution stay exact") {
    import spark.implicits._
    val root = s"$warehouse/vec"
    writeKv((1L to 500L).map(i => (i, i * 1.0)), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)        // v1
    def planOf(sql: String) =
      spark.sql(sql).queryExecution.executedPlan.toString
    // clean snapshot: the scan advertises the vectorized path
    assert(planOf("SELECT k FROM sqlcat.vec").contains("Columnar: true"))
    assert(spark.sql("SELECT sum(v) AS s FROM sqlcat.vec").collect()(0)
      .getDouble(0) == (1 to 500).map(_.toDouble).sum)
    // empty projection: count(*) over the columnar path (footer-only)
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.vec").collect()(0)
      .getLong(0) == 500L)
    // schema evolution: the late file's new column null-pads in the
    // OLD file through constant-null vectors
    Seq((501L, 501.0, "tag")).toDF("k", "v", "t").repartition(1)
      .write.mode("overwrite").parquet(s"$root/w2")
    TableFormat.appendFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/w2"))                // v2
    val evo = spark.sql(
      "SELECT k, t FROM sqlcat.vec WHERE k IN (1, 501) ORDER BY k").collect()
    assert(evo.length == 2 && evo(0).isNullAt(1) && evo(1).getString(1) == "tag")
    assert(spark.sql("SELECT count(t) AS n FROM sqlcat.vec").collect()(0)
      .getLong(0) == 1L)
    // a pending MoR manifest stays COLUMNAR (r13): the mask applies over
    // the vectorized batches via row-id remapping — masked rows absent,
    // projections with and without the key both exact, count(*) (empty
    // projection + scan-appended key) exact too
    TableFormat.deleteKeysMoR(spark, root, root, Seq(2L, 3L))     // v3
    assert(planOf("SELECT k FROM sqlcat.vec").contains("Columnar: true"))
    assert(spark.sql("SELECT k FROM sqlcat.vec ORDER BY k LIMIT 3").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 4L, 5L))
    assert(spark.sql("SELECT v FROM sqlcat.vec").collect()
      .map(_.getDouble(0)).sum == (1 to 501).map(_.toDouble).sum - 2.0 - 3.0)
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.vec").collect()(0)
      .getLong(0) == 499L)
    // compaction materializes the masks and restores the fast path
    TableFormat.compact(spark, root, root, 1)                     // v4
    assert(planOf("SELECT k FROM sqlcat.vec").contains("Columnar: true"))
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.vec").collect()(0)
      .getLong(0) == 499L)
    // pinned pre-delete version still reads columnar and un-masked
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.vec VERSION AS OF 2")
      .collect()(0).getLong(0) == 501L)
  }

  test("metadata-aggregate pushdown: count/min/max answered from commit stats; MoR/doubles/filters fall back") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = s"$warehouse/agg"
    spark.range(1, 101).select(col("id").as("k"), (col("id") * 1.5).as("v"),
        date_add(lit(java.sql.Date.valueOf("2024-03-01")),
          col("id").cast("int")).as("d"))
      .repartition(3).write.mode("overwrite").parquet(s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3, zoneCols = Seq("d"))
    def planOf(sql: String) = spark.sql(sql).queryExecution.executedPlan.toString
    val q = "SELECT count(*) AS n, min(k) AS k0, max(k) AS k1, " +
      "min(d) AS d0, max(d) AS d1 FROM sqlcat.agg"
    // the pushed plan is a driver-local row (LocalTableScan over the
    // stats columns) — no BatchScan of data files anywhere
    def pushedDown(plan: String) =
      plan.contains("LocalTableScan [count_star") && !plan.contains("BatchScan")
    assert(pushedDown(planOf(q)), planOf(q))
    val r = spark.sql(q).collect()(0)
    assert(r.getLong(0) == 100L && r.getLong(1) == 1L && r.getLong(2) == 100L)
    assert(r.getDate(3) == java.sql.Date.valueOf("2024-03-02"))
    assert(r.getDate(4) == java.sql.Date.valueOf("2024-06-09"))
    // min/max on a DOUBLE never push (truncated bounds are not extrema)
    val qd = "SELECT min(v) AS v0 FROM sqlcat.agg"
    assert(!planOf(qd).contains("LocalTableScan"))
    assert(spark.sql(qd).collect()(0).getDouble(0) == 1.5)
    // a WHERE keeps the aggregate on a real scan (filters stay residual)
    val qf = "SELECT count(*) AS n FROM sqlcat.agg WHERE k > 50"
    assert(!planOf(qf).contains("LocalTableScan"))
    assert(spark.sql(qf).collect()(0).getLong(0) == 50L)
    // pending MoR manifests refuse the pushdown and the fallback is exact
    TableFormat.deleteKeysMoR(spark, root, root, Seq(1L, 100L))
    assert(!planOf(q).contains("LocalTableScan"))
    val r2 = spark.sql(q).collect()(0)
    assert(r2.getLong(0) == 98L && r2.getLong(1) == 2L && r2.getLong(2) == 99L)
    // compaction materializes the masks; the pushdown returns, post-delete
    TableFormat.compact(spark, root, root, 1)
    assert(pushedDown(planOf(q)))
    val r3 = spark.sql(q).collect()(0)
    assert(r3.getLong(0) == 98L && r3.getLong(1) == 2L && r3.getLong(2) == 99L)
  }

  test("GROUPED metadata-aggregate pushdown: GROUP BY an identity " +
      "partition column answers from per-file tuples; impure layouts " +
      "and transform terms fall back") {
    val root = s"$warehouse/gagg"
    spark.sql("""CREATE TABLE sqlcat.gagg (k BIGINT, g BIGINT, v BIGINT)
      PARTITIONED BY (g) TBLPROPERTIES('key_col'='k')""")
    spark.sql("""INSERT INTO sqlcat.gagg
      SELECT id AS k, id % 4 AS g, id * 3 AS v FROM range(200)""")
    def planOf(sql: String) = spark.sql(sql).queryExecution.executedPlan.toString
    val q = "SELECT g, count(*) AS n, min(k) AS k0, max(k) AS k1 " +
      "FROM sqlcat.gagg GROUP BY g"
    assert(planOf(q).contains("LocalTableScan") &&
      !planOf(q).contains("BatchScan"), planOf(q))
    val rows = spark.sql(q).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(rows == (0L until 4L).map(g =>
      (g, 50L, g, 196L + g)), rows)
    // a deletion vector keeps the grouped COUNT exact (per-file
    // liveRows; the file's group is its tuple) but refuses extrema
    TableFormat.deletePositions(spark, root, s"$root/data",
      col("k") < 8 && col("g") === 1)
    val qc = "SELECT g, count(*) AS n FROM sqlcat.gagg GROUP BY g"
    assert(planOf(qc).contains("LocalTableScan"), planOf(qc))
    assert(spark.sql(qc).collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq == Seq((0L, 50L), (1L, 48L), (2L, 50L), (3L, 50L)))
    assert(!planOf(q).contains("LocalTableScan"))
    // compaction across values makes a mixed file: the grouped pushdown
    // refuses and the real scan stays exact
    TableFormat.compact(spark, root, s"$root/data", 1)
    assert(!planOf(qc).contains("LocalTableScan"))
    assert(spark.sql(qc).collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq == Seq((0L, 50L), (1L, 48L), (2L, 50L), (3L, 50L)))
    // a TRANSFORM term (bucket) is not a value-carrying group column
    spark.sql("""CREATE TABLE sqlcat.gaggb (k BIGINT, v BIGINT)
      PARTITIONED BY (bucket(4, k))""")
    spark.sql("INSERT INTO sqlcat.gaggb SELECT id, id FROM range(40)")
    assert(!planOf("SELECT k, count(*) AS n FROM sqlcat.gaggb GROUP BY k")
      .contains("LocalTableScan"))
  }

  test("SQL DELETE: truncate, key range, date range on zone column; rich predicates refused") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = s"$warehouse/del"
    spark.sql("""CREATE TABLE sqlcat.del (k BIGINT, d DATE, v DOUBLE)
      TBLPROPERTIES('key_col'='k', 'zone_cols'='d')""")
    spark.sql("""INSERT INTO sqlcat.del SELECT id AS k,
      date_add(DATE'2024-01-01', CAST(id AS INT)) AS d, id * 1.0 AS v
      FROM range(1, 101)""")
    def ks() = spark.sql("SELECT k FROM sqlcat.del ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    // key-range delete: whole files dropped / boundary rewritten
    spark.sql("DELETE FROM sqlcat.del WHERE k >= 11 AND k <= 90")
    assert(ks() == ((1L to 10L) ++ (91L to 100L)))
    // date-range delete on the zone column (d = 2024-01-01 + k days, so
    // d > 2024-04-05 is exactly k >= 96)
    spark.sql("DELETE FROM sqlcat.del WHERE d > DATE'2024-04-05'")
    assert(ks() == ((1L to 10L) ++ (91L to 95L)))
    // equality delete
    spark.sql("DELETE FROM sqlcat.del WHERE k = 5")
    assert(ks() == (Seq(1L, 2L, 3L, 4L, 6L, 7L, 8L, 9L, 10L) ++ (91L to 95L)))
    // a provably-empty range is a no-op (no commit)
    val vBefore = TableFormat.versions(spark, root).last
    spark.sql("DELETE FROM sqlcat.del WHERE k > 10 AND k < 5")
    assert(TableFormat.versions(spark, root).last == vBefore)
    // rich predicates fall through to the GROUP-BASED rewrite
    // (copy-on-write row-level DELETE) and stay exact
    spark.sql("DELETE FROM sqlcat.del WHERE v > 2.5 AND k % 2 = 0")
    assert(ks() == (Seq(1L, 2L, 3L, 7L, 9L) ++ Seq(91L, 93L, 95L)))
    // unconditional delete = truncate in one commit; history survives
    spark.sql("DELETE FROM sqlcat.del")
    assert(ks().isEmpty)
    assert(spark.sql(s"SELECT count(*) AS n FROM sqlcat.del VERSION AS OF ${vBefore}")
      .collect()(0).getLong(0) > 0L)
  }

  test("SQL DELETE edge semantics: domain-edge strict bounds are empty (no overflow), null rows survive range deletes") {
    val root = s"$warehouse/deledge"
    spark.sql("""CREATE TABLE sqlcat.deledge (k BIGINT, z BIGINT, v DOUBLE)
      TBLPROPERTIES('key_col'='k', 'zone_cols'='z')""")
    spark.sql("""INSERT INTO sqlcat.deledge VALUES
      (1, 10, 1.0), (2, 20, 2.0), (3, NULL, 3.0), (4, 40, 4.0)""")
    def rows() = spark.sql("SELECT k FROM sqlcat.deledge ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    // `k > Long.MaxValue` is provably empty: a blind +1 would wrap to
    // Long.MinValue and delete the WHOLE table
    spark.sql(s"DELETE FROM sqlcat.deledge WHERE k > ${Long.MaxValue}L")
    assert(rows() == Seq(1L, 2L, 3L, 4L))
    spark.sql(s"DELETE FROM sqlcat.deledge WHERE k < ${Long.MinValue}L")
    assert(rows() == Seq(1L, 2L, 3L, 4L))
    // no commit happened either time (pure no-ops)
    assert(TableFormat.versions(spark, root).size == 2)
    // a zone-range delete must NOT delete the z IS NULL row (SQL: NULL
    // never satisfies `z < 30`), even though file bounds cannot see it
    spark.sql("DELETE FROM sqlcat.deledge WHERE z < 30")
    assert(rows() == Seq(3L, 4L))
    assert(spark.sql(
      "SELECT v FROM sqlcat.deledge WHERE z IS NULL").collect()
      .map(_.getDouble(0)).toSeq == Seq(3.0))
  }

  test("INSERT INTO honors the declared partition spec: routed files with tight zone bounds") {
    import org.apache.spark.sql.functions._
    val root = s"$warehouse/specins"
    spark.sql(s"""CREATE TABLE sqlcat.specins (k BIGINT, d DATE, v DOUBLE)
      TBLPROPERTIES('key_col'='k', 'zone_cols'='d',
                    '${TableFormat.PartitionSpecProp}'='month(d)')""")
    // 4 months of data in ONE insert; required distribution/ordering
    // makes the writer roll per month
    spark.sql("""INSERT INTO sqlcat.specins SELECT id AS k,
      date_add(DATE'2024-01-01', CAST(id / 3 AS INT) * 31) AS d, id * 1.0 AS v
      FROM range(0, 12)""")
    val snap = TableFormat.snapshot(spark, root)
    val months = spark.sql(
      "SELECT count(DISTINCT date_trunc('MONTH', d)) FROM sqlcat.specins")
      .collect()(0).getLong(0)
    assert(snap.files.size == months.toInt, s"${snap.files.size} vs $months")
    // each routed file's d-bounds stay within one calendar month
    snap.files.foreach { f =>
      val (lo, hi) = f.zones("d")
      val (l, h) = (java.time.LocalDate.ofEpochDay(lo),
        java.time.LocalDate.ofEpochDay(hi))
      assert(l.getYear == h.getYear && l.getMonth == h.getMonth, f.file)
    }
    // a month probe through SQL prunes the other months' files
    val df = spark.sql(
      "SELECT k FROM sqlcat.specins WHERE d >= DATE'2024-02-01' AND d <= DATE'2024-02-29'")
    val m = "PrunedFiles: (\\d+)/(\\d+)".r
      .findFirstMatchIn(df.queryExecution.executedPlan.toString)
    assert(m.exists(x => x.group(1).toInt == months.toInt - 1), 
      df.queryExecution.executedPlan.toString)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L, 5L))
  }

  test("row-level SQL: MERGE INTO and UPDATE rewrite only matched groups; conflicts fail loud") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = s"$warehouse/rl"
    spark.sql("""CREATE TABLE sqlcat.rl (k BIGINT, v DOUBLE, tag STRING)
      TBLPROPERTIES('key_col'='k', 'constraint.v_pos'='v > 0')""")
    // two disjoint key-range files so group replacement is observable
    spark.sql("""INSERT INTO sqlcat.rl SELECT id AS k, id * 1.0 AS v,
      'a' AS tag FROM range(1, 51)""")
    spark.sql("""INSERT INTO sqlcat.rl SELECT id AS k, id * 1.0 AS v,
      'b' AS tag FROM range(1001, 1051)""")
    val before = TableFormat.snapshot(spark, root)
    assert(before.files.size >= 2)
    // every file whose key bounds miss [1,10] is an UNMATCHED group and
    // must survive the UPDATE by reference (group-level rewrite)
    val untouched = before.files
      .filter(f => f.minKey > 10L || f.maxKey < 1L).map(_.file)
    assert(untouched.nonEmpty)
    spark.sql("UPDATE sqlcat.rl SET v = v + 1000 WHERE k <= 10")
    val afterU = TableFormat.snapshot(spark, root)
    assert(afterU.op.contains("update"))
    assert(untouched.forall(f => afterU.files.exists(_.file == f)),
      "unmatched group was rewritten")
    assert(spark.sql("SELECT sum(v) AS s FROM sqlcat.rl WHERE k <= 10")
      .collect()(0).getDouble(0) == (1 to 10).map(_ + 1000.0).sum)
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.rl").collect()(0)
      .getLong(0) == 100L)
    // MERGE INTO: updates, deletes and inserts in one statement
    Seq((5L, 5000.0), (1005L, 5000.0), (2000L, 7.0))
      .toDF("mk", "mv").createOrReplaceTempView("rl_src")
    spark.sql("""MERGE INTO sqlcat.rl t USING rl_src s ON t.k = s.mk
      WHEN MATCHED AND t.k < 1000 THEN UPDATE SET v = s.mv
      WHEN MATCHED THEN DELETE
      WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (s.mk, s.mv, 'm')""")
    val afterM = TableFormat.snapshot(spark, root)
    assert(afterM.op.contains("merge"))
    val got = spark.sql(
      "SELECT k, v, tag FROM sqlcat.rl WHERE k IN (5, 1005, 2000) ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got == Seq((5L, 5000.0, "a"), (2000L, 7.0, "m")), got)
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.rl").collect()(0)
      .getLong(0) == 100L) // -1 delete +1 insert
    // a constraint-violating UPDATE is refused and leaves no version
    val vNow = TableFormat.versions(spark, root).last
    val e = intercept[Exception](
      spark.sql("UPDATE sqlcat.rl SET v = -5 WHERE k = 7"))
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse("")).mkString("|")
    assert(msgs(e).contains("v_pos"), msgs(e))
    assert(TableFormat.versions(spark, root).last == vNow)
    // time travel still serves the pre-UPDATE content (snapshot isolation)
    assert(spark.sql(s"SELECT sum(v) AS s FROM sqlcat.rl VERSION AS OF ${before.version} WHERE k <= 10")
      .collect()(0).getDouble(0) == (1 to 10).map(_.toDouble).sum)
    // SELECT _file metadata column works on plain reads too
    assert(spark.sql("SELECT DISTINCT _file FROM sqlcat.rl").count() >= 2)
  }

  test("ALTER TABLE: add-only column evolution and TBLPROPERTIES as the SQL constraint/spec route") {
    val root = s"$warehouse/alt"
    spark.sql("""CREATE TABLE sqlcat.alt (k BIGINT, v DOUBLE)
      TBLPROPERTIES('key_col'='k')""")
    spark.sql("INSERT INTO sqlcat.alt SELECT id AS k, id * 1.0 AS v FROM range(1, 11)")
    // ADD COLUMNS: one metadata commit, old rows null back-fill
    spark.sql("ALTER TABLE sqlcat.alt ADD COLUMNS (tag STRING)")
    assert(spark.sql("SELECT count(tag) AS n FROM sqlcat.alt")
      .collect()(0).getLong(0) == 0L)
    spark.sql("INSERT INTO sqlcat.alt VALUES (11, 11.0, 'new')")
    assert(spark.sql("SELECT count(tag) AS n FROM sqlcat.alt")
      .collect()(0).getLong(0) == 1L)
    // SET TBLPROPERTIES is the SQL route to CHECK constraints: an
    // unsatisfiable one is refused against the existing rows...
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE sqlcat.alt SET TBLPROPERTIES('constraint.big_v'='v > 100')"))
    assert(e.getMessage.contains("violate"), e.getMessage)
    // ...a satisfiable one lands and ENFORCES from the next INSERT
    spark.sql("ALTER TABLE sqlcat.alt SET TBLPROPERTIES('constraint.pos_v'='v > 0')")
    val e2 = intercept[Exception](
      spark.sql("INSERT INTO sqlcat.alt VALUES (12, -1.0, 'bad')"))
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse("")).mkString("|")
    assert(msgs(e2).contains("pos_v"), msgs(e2))
    // UNSET drops the constraint; the insert then lands
    spark.sql("ALTER TABLE sqlcat.alt UNSET TBLPROPERTIES('constraint.pos_v')")
    spark.sql("INSERT INTO sqlcat.alt VALUES (12, -1.0, 'ok')")
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.alt")
      .collect()(0).getLong(0) == 12L)
    // type changes are refused loudly (rewrite territory)
    val e3 = intercept[Exception](spark.sql(
      "ALTER TABLE sqlcat.alt ALTER COLUMN v TYPE STRING"))
    assert(e3.getMessage.toLowerCase.contains("unsupported") ||
      e3.getMessage.toLowerCase.contains("rewrite"), e3.getMessage)
  }

  test("concurrent SQL INSERTs serialize through the commit CAS: both land, nothing lost") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val root = s"$warehouse/conc" // forces the lazy catalog registration
    spark.sql("""CREATE TABLE sqlcat.conc (k BIGINT, v DOUBLE)
      TBLPROPERTIES('key_col'='k')""")
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    def ins(lo: Int, hi: Int) = new java.util.concurrent.Callable[Unit] {
      def call(): Unit = { start.await()
        spark.sql(s"INSERT INTO sqlcat.conc SELECT id AS k, id * 1.0 AS v FROM range($lo, $hi)") }
    }
    val fa = pool.submit(ins(1, 101)); val fb = pool.submit(ins(1001, 1101))
    start.countDown()
    fa.get(120, TimeUnit.SECONDS); fb.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    val r = spark.sql("SELECT count(*) AS n, sum(k) AS s FROM sqlcat.conc").collect()(0)
    assert(r.getLong(0) == 200L)
    assert(r.getLong(1) == (1L to 100L).sum + (1001L to 1100L).sum)
    assert(TableFormat.versions(spark, root) == Seq(1L, 2L, 3L))
  }

  test("nested ARRAY<STRUCT> and STRUCT columns: CTAS + INSERT, explode read-back, null shapes, evolution") {
    val root = s"$warehouse/nested"
    spark.sql("""SELECT id AS k,
        CASE WHEN id % 5 = 0 THEN NULL
             ELSE named_struct('pri', concat('p', CAST(id % 3 AS STRING)),
                               'w', id * 10) END AS category,
        CASE WHEN id % 7 = 0 THEN NULL
             WHEN id % 4 = 0 THEN
               CAST(array() AS ARRAY<STRUCT<line: INT, qty: BIGINT>>)
             ELSE array(named_struct('line', 1, 'qty', id),
                        named_struct('line', 2, 'qty', id * 2)) END AS tags
      FROM range(1, 41)""").createOrReplaceTempView("nested_src")
    spark.sql("""CREATE TABLE sqlcat.nested TBLPROPERTIES('key_col'='k')
      AS SELECT * FROM nested_src WHERE k <= 20""")
    spark.sql("INSERT INTO sqlcat.nested SELECT * FROM nested_src WHERE k > 20")
    // flat + struct-member read through the catalog readers
    val base = spark.sql("""SELECT count(*) AS n,
        count(category.pri) AS np, sum(category.w) AS sw
      FROM sqlcat.nested""").collect()(0)
    assert(base.getLong(0) == 40L)
    assert(base.getLong(1) == 40L - 8L) // k%5=0 -> null category
    assert(base.getLong(2) == (1L to 40L).filterNot(_ % 5 == 0).map(_ * 10).sum)
    // explode(tags): array-of-struct round-trip, element fields typed
    val ex = spark.sql("""SELECT count(*) AS n, sum(t.qty) AS sq, max(t.line) AS ml
      FROM sqlcat.nested LATERAL VIEW explode(tags) x AS t""").collect()(0)
    val withTags = (1L to 40L).filterNot(k => k % 7 == 0 || k % 4 == 0)
    assert(ex.getLong(0) == withTags.size * 2L)
    assert(ex.getLong(1) == withTags.map(k => k + 2 * k).sum)
    assert(ex.getInt(2) == 2)
    // null / empty array shapes survive exactly
    val shapes = spark.sql("""SELECT
        count(CASE WHEN tags IS NULL THEN 1 END) AS n_null,
        count(CASE WHEN tags IS NOT NULL AND size(tags) = 0 THEN 1 END) AS n_empty
      FROM sqlcat.nested""").collect()(0)
    assert(shapes.getLong(0) == (1L to 40L).count(_ % 7 == 0))
    assert(shapes.getLong(1) == (1L to 40L).count(k => k % 4 == 0 && k % 7 != 0))
    // the clean snapshot still plans the vectorized path over nested cols
    val plan = spark.sql("SELECT tags FROM sqlcat.nested")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Columnar: true"), plan.linesIterator.take(8).mkString("\n"))
    // add-only evolution: a nested column the old files predate null-fills
    spark.sql("""ALTER TABLE sqlcat.nested
      ADD COLUMN extra STRUCT<a: BIGINT, b: STRING>""")
    spark.sql("""INSERT INTO sqlcat.nested VALUES
      (100, named_struct('pri', 'px', 'w', CAST(1000 AS BIGINT)),
       array(named_struct('line', 9, 'qty', CAST(7 AS BIGINT))),
       named_struct('a', CAST(5 AS BIGINT), 'b', 'five'))""")
    val evo = spark.sql("""SELECT count(extra.a) AS ne, sum(extra.a) AS se,
        count(*) AS n FROM sqlcat.nested""").collect()(0)
    assert(evo.getLong(0) == 1L && evo.getLong(1) == 5L && evo.getLong(2) == 41L)
    // MoR masks compose with nested reads (row reader decodes arrays)
    TableFormat.deleteKeysMoR(spark, root, root, Seq(1L, 2L))
    val masked = spark.sql("""SELECT count(*) AS n, sum(t.qty) AS sq
      FROM sqlcat.nested LATERAL VIEW explode(tags) x AS t""").collect()(0)
    assert(masked.getLong(0) == withTags.size * 2L + 1L - 4L) // -k1,k2 +evo row
    assert(masked.getLong(1) == withTags.map(k => 3 * k).sum + 7L - 9L)
  }

  test("CALL graft.system procedures: the MoR read-amplification dial end-to-end through SQL") {
    val root = s"$warehouse/dial"
    spark.sql("""CREATE TABLE sqlcat.dial (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k')""")
    spark.sql("INSERT INTO sqlcat.dial SELECT id, id * 100 FROM range(1, 1001)")
    def planOf(sql: String) =
      spark.sql(sql).queryExecution.executedPlan.toString
    // clean table: vectorized scan + metadata-aggregate pushdown
    assert(planOf("SELECT v FROM sqlcat.dial").contains("Columnar: true"))
    assert(planOf("SELECT count(*) FROM sqlcat.dial").contains("LocalTableScan"))
    // merge-on-read deletes (two manifests): the scan STAYS columnar
    // (r13 — masks apply over vectorized batches), while the
    // metadata-aggregate pushdown still honestly refuses
    TableFormat.deleteKeysMoR(spark, root, root, Seq(10L, 20L))
    TableFormat.deleteKeysMoR(spark, root, root, Seq(30L))
    assert(planOf("SELECT v FROM sqlcat.dial").contains("Columnar: true"))
    assert(!planOf("SELECT count(*) FROM sqlcat.dial").contains("LocalTableScan"))
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.dial")
      .collect()(0).getLong(0) == 997L)
    // CALL compact_manifests first (pure-metadata merge), then compact:
    // the dial turns back — columnar scan and pushdown restored
    val cm = spark.sql("CALL sqlcat.system.compact_manifests('dial')").collect()(0)
    assert(cm.getLong(1) == 2L && cm.getLong(2) == 1L, cm.toString)
    val cp = spark.sql("CALL sqlcat.system.compact('dial', 2)").collect()(0)
    assert(cp.getLong(1) == 2L, cp.toString)
    assert(planOf("SELECT v FROM sqlcat.dial").contains("Columnar: true"))
    assert(planOf("SELECT count(*) FROM sqlcat.dial").contains("LocalTableScan"))
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.dial")
      .collect()(0).getLong(0) == 997L)
    assert(spark.sql("SELECT sum(v) AS s FROM sqlcat.dial").collect()(0)
      .getLong(0) == (1L to 1000L).filterNot(Set(10L, 20L, 30L)).map(_ * 100).sum)
    // maintenance breadth: bin-pack + retention through CALL
    val sf = spark.sql("CALL sqlcat.system.compact_small_files('dial', 10000)")
      .collect()(0)
    assert(sf.getLong(1) == 2L && sf.getLong(2) == 1L, sf.toString)
    val exp = spark.sql("CALL sqlcat.system.expire_snapshots('dial', 2, 0)")
      .collect()(0)
    assert(exp.getLong(0) > 0L && exp.getLong(1) > 0L, exp.toString)
    // expired prefix gone, head intact
    assert(TableFormat.versions(spark, root).size == 2)
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.dial")
      .collect()(0).getLong(0) == 997L)
    // unknown procedure fails loud
    val e = intercept[Exception](
      spark.sql("CALL sqlcat.system.nope('dial')").collect())
    assert(e.getMessage.contains("nope") || e.getMessage.contains("procedure"),
      e.getMessage)
  }

  test("PARTITIONED BY DDL transforms map onto the partition spec; bucket routing fans out") {
    import org.apache.spark.sql.functions._
    val root = s"$warehouse/pddl"
    // months(dt) through the idiomatic DDL clause — base column
    // auto-declared as a zone column, spec lands in the commit props
    spark.sql("""CREATE TABLE sqlcat.pddl (k BIGINT, dt DATE, v BIGINT)
      PARTITIONED BY (months(dt)) TBLPROPERTIES('key_col'='k')""")
    val head = TableFormat.snapshot(spark, root)
    assert(head.props(TableFormat.PartitionSpecProp) == "month(dt)")
    assert(head.zoneCols == Seq("dt"))
    spark.sql("""INSERT INTO sqlcat.pddl
      SELECT id, date_add(DATE'2024-01-05', CAST(id AS INT) * 10), id
      FROM range(0, 12)""")
    // 120 days from 2024-01-05 span 4 months -> one routed file each
    val snap2 = TableFormat.snapshot(spark, root)
    assert(snap2.files.size == 4, snap2.files.map(_.file).mkString(","))
    // month files carry tight dt bounds: a one-month probe prunes to 1
    val probe = spark.sql(
      "SELECT v FROM sqlcat.pddl WHERE dt >= DATE'2024-02-01' AND dt <= DATE'2024-02-29'")
    val m = "PrunedFiles: (\\d+)/(\\d+)".r
      .findFirstMatchIn(probe.queryExecution.executedPlan.toString).get
    assert(m.group(1).toInt == 3 && m.group(2).toInt == 4)
    assert(probe.collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 12L).filter(i => {
        val d = java.time.LocalDate.of(2024, 1, 5).plusDays(i * 10)
        d.getMonthValue == 2
      }))
    // PARTITIONED BY and the TBLPROPERTIES side-channel are exclusive
    val e = intercept[Exception](spark.sql(
      s"""CREATE TABLE sqlcat.pddl2 (k BIGINT, v BIGINT)
        PARTITIONED BY (k)
        TBLPROPERTIES('key_col'='k',
                      '${TableFormat.PartitionSpecProp}'='div(k, 10)')"""))
    assert(e.getMessage.contains("not both"), e.getMessage)
    // bucket(n, col): modular fan-out — every routed file holds ONE residue
    spark.sql("""CREATE TABLE sqlcat.pbkt (k BIGINT, v BIGINT)
      PARTITIONED BY (bucket(4, k)) TBLPROPERTIES('key_col'='k')""")
    spark.sql("INSERT INTO sqlcat.pbkt SELECT id, id FROM range(0, 400)")
    val perFile = spark.sql(
      "SELECT _file, count(DISTINCT k % 4) AS nr FROM sqlcat.pbkt GROUP BY _file")
      .collect()
    assert(perFile.nonEmpty && perFile.forall(_.getLong(1) == 1L),
      perFile.mkString(";"))
    assert(spark.sql("SELECT sum(v) AS s FROM sqlcat.pbkt").collect()(0)
      .getLong(0) == (0L until 400L).sum)
    // bare `k IS NOT NULL`-style identity still works through DDL too
    spark.sql("""CREATE TABLE sqlcat.pid (k BIGINT, g BIGINT, v BIGINT)
      PARTITIONED BY (g) TBLPROPERTIES('key_col'='k', 'zone_cols'='g')""")
    spark.sql("INSERT INTO sqlcat.pid SELECT id, id % 3, id FROM range(0, 30)")
    assert(TableFormat.snapshot(spark, s"$warehouse/pid").files.size == 3)
  }

  test("days() transform resolves against the column type: TIMESTAMP routes per DAY, never per microsecond") {
    // days(dt) on a DATE: width-1 div over epoch days
    spark.sql("""CREATE TABLE sqlcat.pday (k BIGINT, dt DATE)
      PARTITIONED BY (days(dt)) TBLPROPERTIES('key_col'='k')""")
    assert(TableFormat.snapshot(spark, s"$warehouse/pday")
      .props(TableFormat.PartitionSpecProp) == "div(dt, 1)")
    // days(ts) on a TIMESTAMP: zone-long space is epoch MICROS — the
    // mapped width must be a full day of micros, or 40 rows spread over
    // 2 days would route 40 files (one per distinct microsecond), each
    // holding an open ParquetWriter
    spark.sql("""CREATE TABLE sqlcat.ptsd (k BIGINT, ts TIMESTAMP)
      PARTITIONED BY (days(ts)) TBLPROPERTIES('key_col'='k')""")
    assert(TableFormat.snapshot(spark, s"$warehouse/ptsd")
      .props(TableFormat.PartitionSpecProp) == "div(ts, 86400000000)")
    spark.sql("""INSERT INTO sqlcat.ptsd
      SELECT id, timestampadd(MINUTE, CAST(id AS INT) * 37,
                              TIMESTAMP'2024-03-01 00:00:00')
      FROM range(0, 40)""")
    // 40 rows x 37 min ≈ 24.7 h -> exactly 2 day files
    val snap = TableFormat.snapshot(spark, s"$warehouse/ptsd")
    assert(snap.files.size == 2, snap.files.map(_.file).mkString(","))
    assert(spark.sql("SELECT count(*) FROM sqlcat.ptsd")
      .collect()(0).getLong(0) == 40L)
    // a non-temporal column is refused loudly, not routed absurdly
    val e = intercept[Exception](spark.sql(
      """CREATE TABLE sqlcat.pbad (k BIGINT)
        PARTITIONED BY (days(k)) TBLPROPERTIES('key_col'='k')"""))
    assert(e.getMessage.contains("DATE or TIMESTAMP"), e.getMessage)
  }

  test("NULL/IN file pruning: recorded null counts and key blooms prune at plan time, results exact") {
    import spark.implicits._
    val root = s"$warehouse/nulin"
    TableFormat.createEmpty(spark, root, "k", "k BIGINT, g BIGINT, v BIGINT",
      numBits = 1 << 12, numHashes = 5, zoneCols = Seq("g"))
    def appendDf(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      df.repartition(1).write.mode("overwrite").parquet(s"$root/w_$tag")
      TableFormat.appendFiles(spark, root,
        TableFormat.listParquet(spark, s"$root/w_$tag"))
    }
    // f1: keys 0..198 EVEN, g never null; f2: keys 100..199, g null on
    // multiples of 10; f3: keys 200..299, g ALL null
    appendDf((0L until 200L by 2).map(i => (i, i % 7, i)).toDF("k", "g", "v"), "f1")
    appendDf(spark.range(100, 200).select(col("id").as("k"),
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id") % 7).as("g"),
      col("id").as("v")), "f2")
    appendDf(spark.range(200, 300).select(col("id").as("k"),
      lit(null).cast("long").as("g"), col("id").as("v")), "f3")
    def pruned(sql: String): (Int, Int, Long) = {
      val df = spark.sql(sql)
      val m = "PrunedFiles: (\\d+)/(\\d+)".r
        .findFirstMatchIn(df.queryExecution.executedPlan.toString).get
      (m.group(1).toInt, m.group(2).toInt, df.count())
    }
    // IS NULL prunes the PROVABLY null-free f1 (recorded zero), keeps
    // f2 (nulls recorded) and f3 (all null)
    assert(pruned("SELECT v FROM sqlcat.nulin WHERE g IS NULL") ==
      ((1, 3, 10L + 100L)))
    // IS NOT NULL prunes the provably ALL-null f3
    assert(pruned("SELECT v FROM sqlcat.nulin WHERE g IS NOT NULL") ==
      ((1, 3, 100L + 90L)))
    // IN on the key: ranges eliminate f3, the bloom eliminates f2
    // (1000 out of range everywhere; 4 in f1's range and bloom-present)
    assert(pruned("SELECT v FROM sqlcat.nulin WHERE k IN (4, 1000)") ==
      ((2, 3, 1L)))
    // an in-range but ABSENT key (odd, f1 holds evens): the bloom alone
    // prunes all three files — zero partitions planned, zero IO
    assert(pruned("SELECT v FROM sqlcat.nulin WHERE k IN (7)") ==
      ((3, 3, 0L)))
    // IN on the zone column prunes by bounds (g in [0,6] on f1/f2)
    assert(pruned("SELECT v FROM sqlcat.nulin WHERE g IN (50)") ==
      ((3, 3, 0L)))
    // combined with a range: conjunction narrows to f2 only
    assert(pruned(
      "SELECT v FROM sqlcat.nulin WHERE g IS NULL AND k >= 100 AND k < 200") ==
      ((2, 3, 10L)))
  }

  test("row-group predicate pushdown: a within-file-selective probe reads one row group, not the file") {
    val root = s"$warehouse/rgpush"
    // ONE sorted 200k-row file with ~tens of row groups (tiny block
    // size), so file-level pruning cannot help a point probe at all
    spark.range(0, 200000).selectExpr("id AS k", "id * 2 AS v")
      .sort("k").coalesce(1)
      .write.option("parquet.block.size", "65536")
      .mode("overwrite").parquet(s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 1 << 14, 5)
    val snap = TableFormat.snapshot(spark, root)
    assert(snap.files.size == 1)
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.size == 1)
      scans.head.metrics("numOutputRows").value
    }
    // vectorized path: the scan surfaces only the surviving row
    // group(s), far below the file's 200k rows
    val probe = spark.sql("SELECT v FROM sqlcat.rgpush WHERE k = 123456")
    assert(probe.queryExecution.executedPlan.toString
      .contains("RowGroupFilter: true"))
    assert(probe.collect().map(_.getLong(0)).toSeq == Seq(246912L))
    val vRows = scanRows(spark.sql(
      "SELECT v FROM sqlcat.rgpush WHERE k = 123456"))
    assert(vRows > 0 && vRows < 20000, s"vectorized scan surfaced $vRows rows")
    // a range probe stays exact
    assert(spark.sql(
      "SELECT sum(v) FROM sqlcat.rgpush WHERE k >= 1000 AND k < 2000")
      .collect()(0).getLong(0) == (1000L until 2000L).map(_ * 2).sum)
    // merge-on-read path: the masked VECTORIZED reader (r13) must
    // row-group-skip too, and the stamped filter must never leak into
    // the manifest read (the mask still applies — the deleted key
    // stays gone)
    TableFormat.deleteKeysMoR(spark, root, root, Seq(123456L))
    val mor = spark.sql("SELECT v FROM sqlcat.rgpush WHERE k = 123456")
    assert(mor.queryExecution.executedPlan.toString.contains("Columnar: true"))
    assert(mor.collect().isEmpty)
    val morRows = scanRows(spark.sql(
      "SELECT v FROM sqlcat.rgpush WHERE k = 123455"))
    assert(morRows > 0 && morRows < 20000, s"MoR scan surfaced $morRows rows")
    assert(spark.sql("SELECT v FROM sqlcat.rgpush WHERE k = 123455")
      .collect().map(_.getLong(0)).toSeq == Seq(246910L))
    // count(*) over the MoR snapshot (no aggregate pushdown under
    // manifests): still exact under stamped filters elsewhere
    assert(spark.sql("SELECT count(*) FROM sqlcat.rgpush").collect()(0)
      .getLong(0) == 199999L)
  }

  test("composite month x bucket spec: bounded open writers, every (month, residue) file routed correctly") {
    // month(dt) is the monotone half (closes the run's writers when the
    // month advances), bucket(k, 3) the interleaving half (map bounded
    // by the DECLARED fan-out of 3) — 6 months x 3 residues = 18 files
    // from one ordered INSERT, and no (month, residue) pair splits
    spark.sql(s"""CREATE TABLE sqlcat.pmb (k BIGINT, dt DATE, v BIGINT)
      TBLPROPERTIES('key_col'='k', 'zone_cols'='dt',
                    '${TableFormat.PartitionSpecProp}'='month(dt), bucket(k, 3)')""")
    spark.sql("""INSERT INTO sqlcat.pmb
      SELECT id, date_add(DATE'2024-01-03', CAST(id AS INT)), id * 2
      FROM range(0, 180)""")
    val snap = TableFormat.snapshot(spark, s"$warehouse/pmb")
    assert(snap.files.size == 18, s"got ${snap.files.size} files")
    val perFile = spark.sql("""SELECT _file,
        count(DISTINCT date_trunc('MONTH', dt)) AS nm,
        count(DISTINCT k % 3) AS nr
      FROM sqlcat.pmb GROUP BY _file""").collect()
    assert(perFile.forall(r => r.getLong(1) == 1L && r.getLong(2) == 1L),
      perFile.mkString(";"))
    assert(spark.sql("SELECT sum(v) FROM sqlcat.pmb").collect()(0)
      .getLong(0) == (0L until 180L).map(_ * 2).sum)
  }

  test("spark.readStream.table streams catalog-table appends; op=replace commits skipped") {
    import org.apache.spark.sql.streaming.Trigger
    val root = s"$warehouse/stread"
    val out = freshRoot()
    spark.sql("""CREATE TABLE sqlcat.stread (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k')""")
    spark.sql("INSERT INTO sqlcat.stread SELECT id, id * 2 FROM range(1, 11)")
    def tick(): Unit = {
      val q = spark.readStream.table("sqlcat.stread")
        .writeStream.format("parquet")
        .option("path", s"$out/sink")
        .option("checkpointLocation", s"$out/cp")
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(300000))
    }
    tick()
    def sunk() = spark.read.parquet(s"$out/sink")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(sunk() == (1L to 10L).map(i => (i, i * 2)))
    // compaction is content-preserving: the stream must NOT re-emit
    spark.sql("CALL sqlcat.system.compact('stread', 1)")
    tick()
    assert(sunk() == (1L to 10L).map(i => (i, i * 2)))
    // a new append ships exactly its delta, offsets resumed from the
    // checkpointed version
    spark.sql("INSERT INTO sqlcat.stread SELECT id, id * 2 FROM range(11, 16)")
    tick()
    assert(sunk() == (1L to 15L).map(i => (i, i * 2)))
    // starting_version: INCLUSIVE (the Delta convention) — a FRESH
    // checkpoint starting AT version 3 skips v2 (the first INSERT) and
    // ships v3 (the compaction replace, skipped as content-preserving)
    // onward: only the second INSERT's rows arrive
    val q2 = spark.readStream.option("starting_version", "3")
      .table("sqlcat.stread")
      .writeStream.format("parquet")
      .option("path", s"$out/sink2")
      .option("checkpointLocation", s"$out/cp2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q2.awaitTermination(300000))
    assert(spark.read.parquet(s"$out/sink2").collect()
      .map(_.getLong(0)).sorted.toSeq == (11L to 15L))
    // starting_version=latest on a fresh checkpoint: nothing yet emitted
    val q3 = spark.readStream.option("starting_version", "latest")
      .table("sqlcat.stread")
      .writeStream.format("parquet")
      .option("path", s"$out/sink3")
      .option("checkpointLocation", s"$out/cp3")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q3.awaitTermination(300000))
    val fs3 = new java.io.File(s"$out/sink3")
    assert(!fs3.exists() ||
      spark.read.parquet(s"$out/sink3").count() == 0L)
  }

  test("BINARY and MAP columns round-trip through the catalog (media payloads in the lakehouse)") {
    val root = s"$warehouse/blobs"
    spark.sql("""SELECT id AS k,
        CASE WHEN id % 9 = 0 THEN NULL
             ELSE encode(concat('blob-', CAST(id AS STRING)), 'utf-8') END AS payload,
        CASE WHEN id % 6 = 0 THEN NULL
             ELSE map('src', concat('img/', CAST(id AS STRING)),
                      'w', CAST(id % 64 AS STRING)) END AS meta
      FROM range(1, 31)""").createOrReplaceTempView("blob_src")
    spark.sql("""CREATE TABLE sqlcat.blobs TBLPROPERTIES('key_col'='k')
      AS SELECT * FROM blob_src WHERE k <= 15""")
    spark.sql("INSERT INTO sqlcat.blobs SELECT * FROM blob_src WHERE k > 15")
    // payload bytes come back exactly; null blobs stay null
    val back = spark.sql("""SELECT k, decode(payload, 'utf-8') AS s,
        meta['src'] AS src, meta['w'] AS w
      FROM sqlcat.blobs ORDER BY k""").collect()
    assert(back.length == 30)
    back.foreach { r =>
      val k = r.getLong(0)
      if (k % 9 == 0) assert(r.isNullAt(1)) else assert(r.getString(1) == s"blob-$k")
      if (k % 6 == 0) assert(r.isNullAt(2) && r.isNullAt(3))
      else { assert(r.getString(2) == s"img/$k"); assert(r.getString(3) == (k % 64).toString) }
    }
    // clean snapshot stays columnar over binary+map; MoR masks compose
    // through the row reader's nested/binary decode
    val plan = spark.sql("SELECT payload, meta FROM sqlcat.blobs")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Columnar: true"), plan.linesIterator.take(6).mkString("\n"))
    TableFormat.deleteKeysMoR(spark, root, root, Seq(1L, 2L))
    val masked = spark.sql("""SELECT count(*) AS n,
        count(payload) AS np, count(meta) AS nm FROM sqlcat.blobs""").collect()(0)
    assert(masked.getLong(0) == 28L)
    assert(masked.getLong(1) == (3L to 30L).count(_ % 9 != 0))
    assert(masked.getLong(2) == (3L to 30L).count(_ % 6 != 0))
    // nested-field pruning reaches the scan: reading one map is not
    // reading the blob column (ReadSchema excludes payload)
    val pruned = spark.sql("SELECT meta['src'] FROM sqlcat.blobs")
      .queryExecution.executedPlan.toString
    assert(pruned.contains("ReadSchema") && !pruned.contains("payload"),
      pruned.linesIterator.take(8).mkString("\n"))
  }

  test("nested add-only evolution: ALTER adds struct members (incl. under arrays); old rows null-fill") {
    val root = s"$warehouse/nevo" // forces the lazy catalog registration
    assert(root.nonEmpty)
    spark.sql("""SELECT id AS k,
        named_struct('pri', concat('p', CAST(id % 3 AS STRING))) AS category,
        array(named_struct('line', 1, 'qty', id)) AS tags
      FROM range(1, 11)""").createOrReplaceTempView("nevo_src")
    spark.sql("""CREATE TABLE sqlcat.nevo TBLPROPERTIES('key_col'='k')
      AS SELECT * FROM nevo_src""")
    // add a struct member and an array-element member — metadata only
    spark.sql("ALTER TABLE sqlcat.nevo ADD COLUMNS (category.note STRING)")
    spark.sql("ALTER TABLE sqlcat.nevo ADD COLUMNS (tags.element.extra BIGINT)")
    // old rows read the new members as null at every nesting level
    val old = spark.sql("""SELECT count(category.note) AS nn,
        count(*) AS n FROM sqlcat.nevo""").collect()(0)
    assert(old.getLong(0) == 0L && old.getLong(1) == 10L)
    val oldTags = spark.sql("""SELECT count(t.extra) AS ne, count(*) AS n
      FROM sqlcat.nevo LATERAL VIEW explode(tags) x AS t""").collect()(0)
    assert(oldTags.getLong(0) == 0L && oldTags.getLong(1) == 10L)
    // new rows carry the widened shape; both generations coexist
    spark.sql("""INSERT INTO sqlcat.nevo VALUES (100,
      named_struct('pri', 'px', 'note', 'hello'),
      array(named_struct('line', 2, 'qty', CAST(7 AS BIGINT),
                         'extra', CAST(42 AS BIGINT))))""")
    val mixed = spark.sql("""SELECT count(category.note) AS nn,
        sum(t.extra) AS se, count(*) AS nt
      FROM sqlcat.nevo LATERAL VIEW explode(tags) x AS t""").collect()(0)
    assert(mixed.getLong(0) == 1L && mixed.getLong(1) == 42L &&
      mixed.getLong(2) == 11L)
    // a nested add under a MISSING parent fails loud
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE sqlcat.nevo ADD COLUMNS (nope.x STRING)"))
    assert(e.getMessage.contains("nope") || e.getMessage.toLowerCase
      .contains("missing field"), e.getMessage)
    // SHOW TBLPROPERTIES exposes the format declarations
    val props = spark.sql("SHOW TBLPROPERTIES sqlcat.nevo").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("key_col") == "k")
    assert(props.contains("graft.current_version"))
  }

  test("namespaces: CREATE/SHOW/DROP organize tables under warehouse subdirectories") {
    val root = s"$warehouse/touch" // forces the lazy catalog registration
    assert(root.nonEmpty)
    spark.sql("CREATE NAMESPACE sqlcat.finance")
    assert(spark.sql("SHOW NAMESPACES IN sqlcat").collect()
      .map(_.getString(0)).contains("finance"))
    spark.sql("""CREATE TABLE sqlcat.finance.txns (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k')""")
    spark.sql("INSERT INTO sqlcat.finance.txns SELECT id, id FROM range(1, 6)")
    assert(spark.sql("SELECT sum(v) AS s FROM sqlcat.finance.txns")
      .collect()(0).getLong(0) == 15L)
    assert(spark.sql("SHOW TABLES IN sqlcat.finance").collect()
      .map(_.getString(1)).contains("txns"))
    // a table dir is NOT a namespace; a non-empty namespace refuses a
    // bare drop and CASCADE removes it with its tables
    assert(!spark.sql("SHOW NAMESPACES IN sqlcat").collect()
      .map(_.getString(0)).contains("txns"))
    val e = intercept[Exception](spark.sql("DROP NAMESPACE sqlcat.finance"))
    assert(e.getMessage.toLowerCase.contains("cascade") ||
      e.getMessage.toLowerCase.contains("not empty"), e.getMessage)
    spark.sql("DROP NAMESPACE sqlcat.finance CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN sqlcat").collect()
      .map(_.getString(0)).contains("finance"))
  }

  test("spec-routed INSERT with NULL partition values commits cleanly (null rows route to one file, stats omit bounds)") {
    val root = s"$warehouse/pnull"
    spark.sql("""CREATE TABLE sqlcat.pnull (k BIGINT, g BIGINT, v BIGINT)
      PARTITIONED BY (g) TBLPROPERTIES('key_col'='k', 'zone_cols'='g')""")
    // the ADVICE-5 shape end-to-end: the writer routes all null-g rows
    // into one file whose g stats are entirely null — the commit's
    // fileStats must record omitted bounds (never NPE), and scans stay
    // exact over the boundless file
    spark.sql("""INSERT INTO sqlcat.pnull
      SELECT id, CASE WHEN id % 3 = 0 THEN NULL ELSE id % 2 END, id
      FROM range(0, 30)""")
    val snap = TableFormat.snapshot(spark, root)
    val boundless = snap.files.filterNot(_.zones.contains("g"))
    assert(boundless.size == 1 && boundless.head.nulls("g") == boundless.head.nRows)
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.pnull WHERE g IS NULL")
      .collect()(0).getLong(0) == 10L)
    assert(spark.sql("SELECT sum(v) AS s FROM sqlcat.pnull WHERE g = 1")
      .collect()(0).getLong(0) ==
      (0L until 30L).filter(i => i % 3 != 0 && i % 2 == 1).sum)
    // and a zone-range DELETE over g keeps the null rows (the round's
    // null-discipline fix, here through the routed layout)
    spark.sql("DELETE FROM sqlcat.pnull WHERE g <= 1")
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.pnull")
      .collect()(0).getLong(0) == 10L)
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.pnull WHERE g IS NULL")
      .collect()(0).getLong(0) == 10L)
  }

  test("RENAME/DROP COLUMN are metadata-only via the column-mapping ledger; old files resolve, dead names never resurrect") {
    val root = s"$warehouse/cmap"
    spark.sql("""CREATE TABLE sqlcat.cmap (k BIGINT, a BIGINT, note STRING)
      TBLPROPERTIES('key_col'='k')""")                                // v1
    spark.sql("INSERT INTO sqlcat.cmap " +
      "SELECT id, id * 2, concat('n', id) FROM range(1, 6)")          // v2
    // RENAME: one metadata commit; the old-era file keeps resolving
    spark.sql("ALTER TABLE sqlcat.cmap RENAME COLUMN a TO b")         // v3
    assert(spark.sql("SELECT b FROM sqlcat.cmap ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == (1L to 5L).map(_ * 2))
    assert(TableFormat.versions(spark, root).last == 3L)
    // mixed eras: new files physically carry b, old files carry a
    spark.sql("INSERT INTO sqlcat.cmap " +
      "SELECT id, id * 2, concat('n', id) FROM range(6, 9)")          // v4
    assert(spark.sql("SELECT sum(b) FROM sqlcat.cmap").collect()(0)
      .getLong(0) == (1L to 8L).map(_ * 2).sum)
    // residual filters on the renamed column work across eras
    assert(spark.sql("SELECT k FROM sqlcat.cmap WHERE b = 4").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    // the row-reader path (_file projection) resolves old eras too
    val byFile = spark.sql(
      "SELECT _file, b FROM sqlcat.cmap WHERE k IN (1, 7)").collect()
    assert(byFile.map(_.getLong(1)).sorted.toSeq == Seq(2L, 14L))
    assert(byFile.map(_.getString(0)).distinct.length == 2)
    // time travel: the pre-rename version shows the OLD name
    val v2cols = spark.sql("SELECT * FROM sqlcat.cmap VERSION AS OF 2")
      .columns.toSeq
    assert(v2cols == Seq("k", "a", "note"), v2cols)
    assert(spark.sql("SELECT a FROM sqlcat.cmap VERSION AS OF 2")
      .collect().map(_.getLong(0)).sorted.toSeq == (1L to 5L).map(_ * 2))
    // DROP + re-ADD: the re-added column must NOT resurrect dead data
    spark.sql("ALTER TABLE sqlcat.cmap DROP COLUMN note")             // v5
    assert(!spark.sql("SELECT * FROM sqlcat.cmap").columns.contains("note"))
    spark.sql("ALTER TABLE sqlcat.cmap ADD COLUMNS (note STRING)")    // v6
    assert(spark.sql("SELECT note FROM sqlcat.cmap").collect()
      .forall(_.isNullAt(0)))
    spark.sql("INSERT INTO sqlcat.cmap SELECT 100, 200, 'fresh'")     // v7
    val notes = spark.sql(
      "SELECT k, note FROM sqlcat.cmap WHERE note IS NOT NULL").collect()
    assert(notes.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((100L, "fresh")))
    // streaming reads under the live schema resolve old eras
    val out = s"${freshRoot()}/out"; val cp = s"${freshRoot()}/cp"
    val q = spark.readStream.table("sqlcat.cmap")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(300000))
    assert(spark.read.parquet(out).selectExpr("sum(b)").collect()(0)
      .getLong(0) == (1L to 8L).map(_ * 2).sum + 200L)
    // MoR masking composes with the mapping (masked vectorized read of
    // an old-era file)
    TableFormat.deleteKeysMoR(spark, root, root, Seq(2L))             // v8
    assert(spark.sql("SELECT sum(b) FROM sqlcat.cmap").collect()(0)
      .getLong(0) == (1L to 8L).map(_ * 2).sum + 200L - 4L)
    // a rewrite migrates files to current physical names; content holds
    spark.sql("CALL sqlcat.system.compact('cmap', 1)")                // v9
    assert(spark.sql("SELECT sum(b) FROM sqlcat.cmap").collect()(0)
      .getLong(0) == (1L to 8L).map(_ * 2).sum + 200L - 4L)
    assert(spark.sql("SELECT k, b FROM sqlcat.cmap WHERE k = 7")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((7L, 14L)))
    // the key column RENAMES through the ledger since r14 (stats re-key
    // at snapshot resolution) — the point probe still prunes and answers
    spark.sql("ALTER TABLE sqlcat.cmap RENAME COLUMN k TO kk")
    assert(spark.sql("SELECT kk, b FROM sqlcat.cmap WHERE kk = 7")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((7L, 14L)))
    // DROPPING the key still refuses loudly
    val e = intercept[Exception](
      spark.sql("ALTER TABLE sqlcat.cmap DROP COLUMN kk"))
    assert(e.getMessage.contains("key"), e.getMessage)
  }

  test("SQL write-audit-publish: CALL create_branch, stage via t$branch_<name>, publish fast-forward, stale fork fails loud, clone") {
    val root = s"$warehouse/wapsql"
    spark.sql("""CREATE TABLE sqlcat.wapsql (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k')""")                               // v1
    spark.sql("INSERT INTO sqlcat.wapsql SELECT id, id * 10 FROM range(1, 6)") // v2
    // fork + stage: branch work is INVISIBLE to main until publish
    val cb = spark.sql("CALL sqlcat.system.create_branch('wapsql', 'audit')")
      .collect()(0)
    assert(cb.getLong(0) == 3L && cb.getLong(1) == 2L, cb.toString)
    spark.sql("INSERT INTO sqlcat.`wapsql$branch_audit` " +
      "SELECT id, id * 10 FROM range(6, 9)")
    assert(spark.sql("SELECT count(*) FROM sqlcat.wapsql")
      .collect()(0).getLong(0) == 5L)
    assert(spark.sql("SELECT count(*) FROM sqlcat.`wapsql$branch_audit`")
      .collect()(0).getLong(0) == 8L)
    // audit on the branch: SQL DELETE works against the branch table
    spark.sql("DELETE FROM sqlcat.`wapsql$branch_audit` WHERE k = 7")
    // publish fast-forwards main; the branch table keeps resolving
    val pb = spark.sql("CALL sqlcat.system.publish_branch('wapsql', 'audit')")
      .collect()(0)
    assert(pb.getLong(0) == 3L, pb.toString)
    assert(spark.sql("SELECT k FROM sqlcat.wapsql ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L, 8L))
    // drop sweeps; main still reads the published files
    spark.sql("CALL sqlcat.system.drop_branch('wapsql', 'audit')")
    assert(spark.sql("SELECT count(*) FROM sqlcat.wapsql")
      .collect()(0).getLong(0) == 7L)
    // stale fork: main advances after the fork -> publish FAILS LOUD
    spark.sql("CALL sqlcat.system.create_branch('wapsql', 'stale')")
    spark.sql("INSERT INTO sqlcat.wapsql SELECT 100, 1000")
    val e = intercept[Exception](spark.sql(
      "CALL sqlcat.system.publish_branch('wapsql', 'stale')"))
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs(e).contains("advanced"), msgs(e))
    spark.sql("CALL sqlcat.system.drop_branch('wapsql', 'stale')")
    // zero-copy clone under a new catalog name, pinned or head
    val cl = spark.sql("CALL sqlcat.system.clone('wapsql', 'wapsql_copy')")
      .collect()(0)
    assert(spark.sql("SELECT sum(v) FROM sqlcat.wapsql_copy")
      .collect()(0).getLong(0) ==
      spark.sql("SELECT sum(v) FROM sqlcat.wapsql").collect()(0).getLong(0))
    // the clone is independent: writing it never moves the source
    spark.sql("INSERT INTO sqlcat.wapsql_copy SELECT 200, 2000")
    assert(spark.sql("SELECT count(*) FROM sqlcat.wapsql")
      .collect()(0).getLong(0) == 8L)
    assert(spark.sql("SELECT count(*) FROM sqlcat.wapsql_copy")
      .collect()(0).getLong(0) == 9L)
  }

  test("CALL lifecycle procedures: rollback, create_tag/drop_tag pin and protect versions") {
    val root = s"$warehouse/lcp"
    spark.sql("""CREATE TABLE sqlcat.lcp (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k')""")
    spark.sql("INSERT INTO sqlcat.lcp SELECT id, id FROM range(1, 11)")    // v2
    spark.sql("INSERT INTO sqlcat.lcp SELECT id, id FROM range(11, 21)")   // v3
    // tag v2, read it back through VERSION AS OF 'name'
    val tg = spark.sql("CALL sqlcat.system.create_tag('lcp', 'beforeb', 2)")
      .collect()(0)
    assert(tg.getLong(1) == 2L, tg.toString)
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.lcp VERSION AS OF 'beforeb'")
      .collect()(0).getLong(0) == 10L)
    // rollback to the tagged state: a NEW commit, history intact
    val rb = spark.sql("CALL sqlcat.system.rollback('lcp', 2)").collect()(0)
    assert(rb.getLong(1) == 2L)
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.lcp")
      .collect()(0).getLong(0) == 10L)
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.lcp VERSION AS OF 3")
      .collect()(0).getLong(0) == 20L)
    // drop the tag; the named ref stops resolving
    spark.sql("CALL sqlcat.system.drop_tag('lcp', 'beforeb')")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM sqlcat.lcp VERSION AS OF 'beforeb'").collect())
    assert(e.getMessage.contains("beforeb") || e.getMessage.contains("tag"),
      e.getMessage)
  }

  test("t$refs and t$manifests surface names and pending masks; " +
      "remove_orphan_files sweeps unreferenced files, keeps every version") {
    val root = s"$warehouse/mrt"
    spark.sql("""CREATE TABLE sqlcat.mrt (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k')""")
    spark.sql("INSERT INTO sqlcat.mrt SELECT id, id FROM range(100)")    // v2
    spark.sql("CALL sqlcat.system.create_tag('mrt', 'base', 2)")         // v3
    spark.sql("CALL sqlcat.system.create_branch('mrt', 'wip')")
    TableFormat.deleteKeysMoR(spark, root, s"$root/data", Seq(7L, 8L))
    TableFormat.deletePositions(spark, root, s"$root/data", col("k") === 11)
    val refs = spark.sql("SELECT name, type, version FROM sqlcat.`mrt$refs`")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq
    assert(refs.map(r => (r._1, r._2)) ==
      Seq(("base", "tag"), ("wip", "branch")), refs)
    assert(refs.head._3 == 2L)
    val masks = spark.sql(
      "SELECT kind, n_masked, data_file FROM sqlcat.`mrt$manifests`")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(masks.length == 2, masks.toSeq)
    assert(masks.count(_._1 == "equality") == 1 &&
      masks.count(_._1 == "dv") == 1)
    assert(masks.find(_._1 == "equality").get._2 == 2L)
    assert(masks.find(_._1 == "dv").get._2 == 1L)
    assert(masks.find(_._1 == "dv").get._3 != null)
    // orphan: a crashed writer's files under data/, never committed
    spark.range(5).toDF("x").coalesce(1).write.mode("overwrite")
      .parquet(s"$root/data/orphan_dir")
    val nVersions = TableFormat.versions(spark, root).size
    val swept = spark.sql(
      "CALL sqlcat.system.remove_orphan_files('mrt', grace_ms => 0)")
      .collect()(0)
    assert(swept.getLong(swept.fieldIndex("files_removed")) >= 1L,
      swept.toString)
    // every version survives, content intact, masks still apply
    assert(TableFormat.versions(spark, root).size == nVersions)
    assert(spark.sql("SELECT count(*) FROM sqlcat.mrt").collect()(0)
      .getLong(0) == 97L)
    assert(spark.sql("SELECT count(*) FROM sqlcat.mrt VERSION AS OF 2")
      .collect()(0).getLong(0) == 100L)
  }
}
