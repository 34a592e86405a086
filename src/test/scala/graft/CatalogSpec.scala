package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.operators.{Catalog, TableFormat}

class CatalogSpec extends SparkTestBase {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_cat").toString

  private def writeKv(pairs: Seq[(Long, Double)], path: String): String = {
    import spark.implicits._
    pairs.toDF("k", "v").repartition(1).write.mode("overwrite").parquet(path)
    path
  }

  private def commitKv(root: String, pairs: Seq[(Long, Double)]): TableFormat.Snapshot = {
    val f = writeKv(pairs, s"$root/w${java.util.UUID.randomUUID().toString}")
    TableFormat.commitFiles(spark, root,
      "k", TableFormat.listParquet(spark, f), 256, 3)
  }

  test("atomic multi-table publish: uncommitted table versions invisible, catalog time travel") {
    import spark.implicits._
    val croot = freshRoot(); val aRoot = freshRoot(); val bRoot = freshRoot()
    // A = facts, B = its derived count — the invariant a catalog reader
    // must never see broken: count(A@pinned) == B@pinned's stored total
    val a1 = commitKv(aRoot, Seq(1L -> 1.0, 2L -> 2.0))
    def deriveB(aSnap: TableFormat.Snapshot): TableFormat.Snapshot = {
      val n = TableFormat.read(spark, aSnap).count()
      val f = s"$bRoot/w${java.util.UUID.randomUUID().toString}"
      Seq((1L, n)).toDF("k", "total").repartition(1)
        .write.mode("overwrite").parquet(f)
      if (TableFormat.versions(spark, bRoot).isEmpty)
        TableFormat.commitFiles(spark, bRoot, "k",
          TableFormat.listParquet(spark, f), 256, 3)
      else {
        val cur = TableFormat.snapshot(spark, bRoot)
        TableFormat.commitTransform(spark, bRoot, "k", 256, 3,
          _ => TableFormat.fileStats(spark, TableFormat.listParquet(spark, f),
            "k", 256, 3), op = Some("append"))
      }
    }
    val b1 = deriveB(a1)
    val (cv1, _) = Catalog.publish(spark, croot, Map("a" -> a1, "b" -> b1))
    assert(cv1 == 1L)
    def invariantAt(cv: Long): Unit = {
      val aSnap = Catalog.snapshotOf(spark, croot, "a", Some(cv))
      val bSnap = Catalog.snapshotOf(spark, croot, "b", Some(cv))
      val n = TableFormat.read(spark, aSnap).count()
      val stored = TableFormat.read(spark, bSnap).collect()(0).getLong(1)
      assert(n == stored, s"catalog v$cv: count(A)=$n but B says $stored")
    }
    invariantAt(1L)
    // advance A (per-table commit lands) — catalog readers still see v1
    // of BOTH until the publish: mid-transaction state is invisible
    val fa2 = writeKv(Seq(3L -> 3.0), s"$aRoot/x2")
    val a2 = TableFormat.appendFiles(spark, aRoot,
      TableFormat.listParquet(spark, fa2))
    assert(a2.version == 2L)
    val (cvMid, midMap) = Catalog.resolve(spark, croot)
    assert(cvMid == 1L && midMap("a").version == 1L)
    invariantAt(1L)
    val b2 = deriveB(a2)
    val (cv2, _) = Catalog.publish(spark, croot, Map("a" -> a2, "b" -> b2))
    assert(cv2 == 2L)
    invariantAt(2L)
    invariantAt(1L) // cross-table time travel still consistent
  }

  test("guarded publish refuses a transaction derived from a stale catalog read") {
    val croot = freshRoot(); val aRoot = freshRoot()
    val a1 = commitKv(aRoot, Seq(1L -> 1.0))
    Catalog.publish(spark, croot, Map("a" -> a1))
    val fa2 = writeKv(Seq(2L -> 2.0), s"$aRoot/x2")
    val a2 = TableFormat.appendFiles(spark, aRoot,
      TableFormat.listParquet(spark, fa2))
    Catalog.publish(spark, croot, Map("a" -> a2), guard = Map("a" -> 1L))
    // a second writer still holding the v1 read: its guard must fail
    val e = intercept[IllegalStateException](
      Catalog.publish(spark, croot, Map("a" -> a2), guard = Map("a" -> 1L)))
    assert(e.getMessage.contains("stale"))
  }

  test("injected CAS collision: commitTransform re-derives against the winner") {
    // deterministic twin of the racing test below: the derive callback
    // publishes a racer's commit BEFORE returning, so this transaction's
    // first tryCommit finds its version taken and must re-derive — the
    // exact loser path a thread race only sometimes exercises
    val croot = freshRoot(); val aRoot = freshRoot(); val bRoot = freshRoot()
    val a1 = commitKv(aRoot, Seq(1L -> 1.0))
    val b1 = commitKv(bRoot, Seq(9L -> 9.0))
    var derives = 0
    val (v, tables) = Catalog.commitTransform(spark, croot, { cur =>
      derives += 1
      if (derives == 1)
        assert(Catalog.tryCommit(spark, croot, 1L,
          Map("a" -> Catalog.TableRef(a1.root, a1.version))), "racer must win v1")
      cur.getOrElse(Map.empty) + ("b" -> Catalog.TableRef(b1.root, b1.version))
    })
    assert(derives == 2, s"expected exactly one CAS loss, derived $derives times")
    assert(v == 2L)
    assert(tables.keySet == Set("a", "b"))
    val (_, resolved) = Catalog.resolve(spark, croot)
    assert(resolved("a").version == 1L && resolved("b").version == 1L)
    // the listed log dir stays append-only: staging happens in a sibling
    // dir, so a concurrent versions() can never stat a vanishing tmp file
    val p = new org.apache.hadoop.fs.Path(s"$croot/_catlog")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(p).map(_.getPath.getName).toSeq
    assert(names.forall(n => n.startsWith("v") && n.endsWith(".json")),
      s"non-commit entries in the listed log dir: $names")
  }

  test("disjoint-table transactions compose through the CAS retry") {
    val croot = freshRoot(); val aRoot = freshRoot(); val bRoot = freshRoot()
    val a1 = commitKv(aRoot, Seq(1L -> 1.0))
    val b1 = commitKv(bRoot, Seq(9L -> 9.0))
    val pool = Executors.newFixedThreadPool(2)
    try {
      val start = new CountDownLatch(1)
      val fa = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = { start.await()
          Catalog.publish(spark, croot, Map("a" -> a1))._1 }
      })
      val fb = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = { start.await()
          Catalog.publish(spark, croot, Map("b" -> b1))._1 }
      })
      start.countDown()
      val got = Set(fa.get(60, TimeUnit.SECONDS), fb.get(60, TimeUnit.SECONDS))
      assert(got == Set(1L, 2L), s"got $got")
      // the loser re-derived against the winner: the final map has BOTH
      val (_, tables) = Catalog.resolve(spark, croot)
      assert(tables.keySet == Set("a", "b"))
      assert(tables("a").version == 1L && tables("b").version == 1L)
    } finally pool.shutdownNow()
  }
}
