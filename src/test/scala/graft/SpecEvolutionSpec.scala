package graft

import org.apache.spark.sql.functions._

import graft.operators.TableFormat

/** PARTITION SPEC EVOLUTION — `ALTER TABLE SET
  * TBLPROPERTIES('partition.spec'=...)` on a LIVE table: old files keep
  * their old-era tuples (reads stay correct, pruning flows through the
  * era-agnostic zone stats), new writes route by the new spec, the
  * storage-partitioned join honestly refuses its report while eras are
  * mixed, and `CALL migrate_partition_spec` rewrites exactly the
  * stale-era files — after which the SPJ plans with zero exchanges. */
class SpecEvolutionSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_pse").toString
    spark.conf.set("spark.sql.catalog.psecat",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.psecat.warehouse", wh)
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

  test("a table re-specced mid-history keeps both eras readable and " +
      "pruned; migrate_partition_spec rewrites ONLY the stale era and " +
      "restores the exchange-free join") {
    warehouse
    spark.sql("""CREATE TABLE psecat.ev (k BIGINT, v BIGINT)
      PARTITIONED BY (bucket(2, k))""")
    spark.sql("INSERT INTO psecat.ev SELECT id, id * 3 FROM range(200)")
    val v2 = TableFormat.snapshot(spark, s"$warehouse/ev")
    assert(v2.files.forall(_.part.exists(_._1 == "bucket(k, 2)")))

    // EVOLVE the spec live: 2 -> 4 buckets
    spark.sql("""ALTER TABLE psecat.ev SET TBLPROPERTIES(
      'partition.spec'='bucket(k, 4)')""")
    spark.sql("INSERT INTO psecat.ev SELECT id, id * 3 FROM range(200, 300)")
    val mixed = TableFormat.snapshot(spark, s"$warehouse/ev")
    val oldEra = mixed.files.filter(_.part.exists(_._1 == "bucket(k, 2)"))
    val newEra = mixed.files.filter(_.part.exists(_._1 == "bucket(k, 4)"))
    assert(oldEra.nonEmpty && newEra.nonEmpty, mixed.files.map(_.part))
    // both eras read correctly
    assert(spark.sql("SELECT sum(v) FROM psecat.ev").collect()(0)
      .getLong(0) == (0L until 300L).map(_ * 3).sum)
    // pruning still works on both eras (zone stats are era-agnostic):
    // a key probe plans fewer files than the table holds
    val probe = spark.sql("SELECT v FROM psecat.ev WHERE k = 250")
    val desc = probe.queryExecution.executedPlan.toString
    assert(probe.collect()(0).getLong(0) == 750L)
    assert(desc.contains("PrunedFiles"), desc)

    // mixed eras: the SPJ report is honestly withheld
    spark.sql("""CREATE TABLE psecat.dim (k BIGINT, w BIGINT)
      PARTITIONED BY (bucket(4, k))""")
    spark.sql("INSERT INTO psecat.dim SELECT id, id FROM range(300)")
    def joinPlan(): (String, Long) = withSpj {
      // plan facts read off the BARE join (an aggregate on top adds its
      // own SinglePartition exchange, which is not the join's shuffle)
      val j = spark.sql("SELECT a.v + b.w AS s FROM psecat.ev a " +
        "JOIN psecat.dim b ON a.k = b.k")
      (j.queryExecution.executedPlan.toString,
        j.agg(sum(col("s"))).collect()(0).getLong(0))
    }
    val expect = (0L until 300L).map(k => k * 3 + k).sum
    val (planMixed, sumMixed) = joinPlan()
    assert(sumMixed == expect)
    assert(planMixed.contains("Exchange"),
      s"mixed-era table must NOT report SPJ:\n$planMixed")

    // migrate: exactly the old-era files rewrite, carried files stay
    val res = spark.sql("CALL psecat.system.migrate_partition_spec('ev')")
      .collect()(0)
    assert(res.getLong(res.fieldIndex("files_migrated")) == oldEra.size)
    assert(res.getLong(res.fieldIndex("files_carried")) == newEra.size)
    val after = TableFormat.snapshot(spark, s"$warehouse/ev")
    assert(after.files.forall(_.part.exists(_._1 == "bucket(k, 4)")))
    assert(newEra.map(_.file).toSet.subsetOf(after.files.map(_.file).toSet),
      "current-era files must carry by reference")
    assert(after.files.forall(_.sorted), "migrated files must re-earn sorted")
    // content preserved; the SPJ now plans with zero exchanges
    val (planAfter, sumAfter) = joinPlan()
    assert(sumAfter == expect)
    assert(!planAfter.contains("Exchange"),
      s"migrated table must SPJ:\n$planAfter")
    // converged: a second migrate rewrites nothing
    val res2 = spark.sql("CALL psecat.system.migrate_partition_spec('ev')")
      .collect()(0)
    assert(res2.getLong(res2.fieldIndex("files_migrated")) == 0L)
  }

  test("migration is lineage-preserving and materializes the stale " +
      "era's pending masks") {
    warehouse
    spark.sql("""CREATE TABLE psecat.lm (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k',
        'write.delete.mode'='merge-on-read')""")
    spark.sql("INSERT INTO psecat.lm SELECT id, id FROM range(100) ORDER BY id")
    // a pending deletion vector on the (spec-less, hence stale) era
    spark.sql("DELETE FROM psecat.lm WHERE v % 9 = 4")
    val before = spark.sql("SELECT k, _row_id FROM psecat.lm").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.sql("""ALTER TABLE psecat.lm SET TBLPROPERTIES(
      'partition.spec'='bucket(k, 3)')""")
    spark.sql("CALL psecat.system.migrate_partition_spec('lm')")
    val snap = TableFormat.snapshot(spark, s"$warehouse/lm")
    assert(snap.files.forall(_.part.exists(_._1 == "bucket(k, 3)")))
    assert(snap.files.forall(_.dv.isEmpty), "masks must materialize")
    assert(snap.files.forall(_.ridCol), "lineage must ride the rewrite")
    val after = spark.sql("SELECT k, _row_id FROM psecat.lm").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == before, "migration moved row ids")
  }
}
