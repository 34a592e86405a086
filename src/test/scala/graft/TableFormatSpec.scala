package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.operators.TableFormat

class TableFormatSpec extends SparkTestBase {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_tf").toString

  private def writeKv(pairs: Seq[(Long, Double)], path: String): String = {
    import spark.implicits._
    pairs.toDF("k", "v").repartition(1).write.mode("overwrite").parquet(path)
    path
  }

  test("commit/snapshot round-trip: append-only log, as-of resolves one commit file") {
    val root = freshRoot()
    val fa = writeKv(Seq(1L -> 10.0, 2L -> 20.0), s"$root/fa")
    val fb = writeKv(Seq(30L -> 30.0), s"$root/fb")
    val s1 = TableFormat.commitFiles(spark, root,
      "k", TableFormat.listParquet(spark, fa) ++ TableFormat.listParquet(spark, fb),
      numBits = 256, numHashes = 3)
    assert(s1.version == 1L && s1.files.size == 2)
    // v2: compaction rewrite — same content, one file; v1 files untouched
    val c0 = s"$root/c0"
    spark.read.parquet(fa, fb).repartition(1).write.mode("overwrite").parquet(c0)
    val s2 = TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, c0), numBits = 256, numHashes = 3)
    assert(s2.version == 2L && s2.files.size == 1)
    assert(TableFormat.versions(spark, root) == Seq(1L, 2L))
    // the log is append-only: exactly one commit FILE per version on disk
    val logFiles = new java.io.File(s"$root/_log").listFiles()
      .map(_.getName).filter(_.endsWith(".json")).sorted
    assert(logFiles.toSeq == Seq(f"v${1L}%020d.json", f"v${2L}%020d.json"))
    def content(v: Long) = TableFormat
      .read(spark, TableFormat.snapshot(spark, root, Some(v)))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(content(1L) == content(2L))
    assert(content(1L) == Seq(1L -> 10.0, 2L -> 20.0, 30L -> 30.0))
    // an uncommitted version is an explicit error, not an empty frame
    val e = intercept[IllegalArgumentException](
      TableFormat.snapshot(spark, root, Some(9L)))
    assert(e.getMessage.contains("version 9"))
  }

  test("zone-pruned scanRange equals the full-scan filter and skips files") {
    val root = freshRoot()
    // three files with disjoint key ranges -> exact zone arithmetic
    val files = Seq(0, 1, 2).flatMap { b =>
      val f = writeKv((0L until 100L).map(i => (b * 1000L + i, i * 1.0)), s"$root/f$b")
      TableFormat.listParquet(spark, f)
    }
    val snap = TableFormat.commitFiles(spark, root, "k", files, 1024, 3)
    val (scan, nRead, nTotal) = TableFormat.scanRange(spark, snap, 1000L, 1099L)
    assert(nTotal == 3 && nRead == 1, s"read=$nRead total=$nTotal")
    val got = scan.orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(got == (1000L until 1100L).toSeq)
    // a range matching nothing reads zero files but keeps the schema
    val (empty, zr, _) = TableFormat.scanRange(spark, snap, 5000L, 6000L)
    assert(zr == 0 && empty.count() == 0L && empty.columns.toSeq == Seq("k", "v"))
  }

  test("bloom filesForKey: no false negatives; typical misses prune") {
    val root = freshRoot()
    val files = Seq(0, 1).flatMap { b =>
      val f = writeKv((0L until 200L).map(i => (b * 100000L + i * 7L, 1.0)), s"$root/g$b")
      TableFormat.listParquet(spark, f)
    }
    val snap = TableFormat.commitFiles(spark, root, "k", files, 1 << 14, 5)
    // every present key's home file is always returned
    for (k <- Seq(0L, 7L, 1393L, 100000L, 100007L)) {
      val hit = TableFormat.filesForKey(snap, k)
      val truth = snap.files.filter(f => k >= f.minKey && k <= f.maxKey).map(_.file)
      assert(truth.forall(hit.contains), s"false negative for $k")
    }
    // absent keys miss both files almost surely at this bloom size; at
    // minimum they can never exceed the file count (sanity, not proof)
    val misses = (1L to 50L).map(i => TableFormat.filesForKey(snap, i * 7L + 3L).size)
    assert(misses.sum < 10, s"bloom FP rate implausibly high: ${misses.sum}/100")
  }

  test("targeted delete: bloom-pruned rewrite, untouched files carried by reference") {
    val root = freshRoot()
    val files = Seq(0, 1, 2).flatMap { b =>
      val f = writeKv((0L until 100L).map(i => (b * 1000L + i, 1.0)), s"$root/h$b")
      TableFormat.listParquet(spark, f)
    }
    val s1 = TableFormat.commitFiles(spark, root, "k", files, 1 << 14, 5)
    val s2 = TableFormat.deleteKeys(spark, root, root, Seq(1005L, 1006L))
    assert(s2.version == 2L)
    // files 0 and 2 hold none of the keys: carried with IDENTICAL paths
    val carried = s1.files.filterNot(f => 1005L >= f.minKey && 1005L <= f.maxKey)
      .map(_.file).toSet
    assert(carried.subsetOf(s2.files.map(_.file).toSet))
    val got = TableFormat.read(spark, s2)
    assert(got.count() == 298L)
    assert(got.filter(col("k").isin(1005L, 1006L)).count() == 0L)
    // v1 still reads the pre-delete content (history survives)
    assert(TableFormat.read(spark,
      TableFormat.snapshot(spark, root, Some(1L))).count() == 300L)
  }

  test("concurrent compaction + delete serialize via CAS retry; pinned reader keeps its snapshot") {
    val root = freshRoot()
    val files = Seq(0, 1).flatMap { b =>
      val f = writeKv((0L until 100L).map(i => (b * 1000L + i, 1.0)), s"$root/j$b")
      TableFormat.listParquet(spark, f)
    }
    val s1 = TableFormat.commitFiles(spark, root, "k", files, 1 << 12, 3)
    val pinned = TableFormat.snapshot(spark, root, Some(1L))
    // both writers resolve v1, then race to commit v2; the loser must
    // re-derive against the winner's snapshot so both changes land
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val fCompact = pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = { start.await(); TableFormat.compact(spark, root, root, 1).version }
    })
    val fDelete = pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = {
        start.await(); TableFormat.deleteKeys(spark, root, root, Seq(5L, 1007L)).version
      }
    })
    start.countDown()
    val versionsCommitted = Seq(fCompact.get(60, TimeUnit.SECONDS),
      fDelete.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    assert(versionsCommitted.sorted == Seq(2L, 3L), s"got $versionsCommitted")
    // the final snapshot reflects BOTH changes regardless of commit order
    val last = TableFormat.snapshot(spark, root)
    val content = TableFormat.read(spark, last)
    assert(content.count() == 198L)
    assert(content.filter(col("k").isin(5L, 1007L)).count() == 0L)
    // snapshot isolation: the pinned v1 reader still sees the original
    // 200 rows — rewrites committed new files and never touched v1's
    assert(TableFormat.read(spark, pinned).count() == 200L)
    assert(TableFormat.read(spark, pinned).filter(col("k") === 5L).count() == 1L)
  }

  test("commit properties round-trip and maintenance commits carry them forward") {
    val root = freshRoot()
    val fa = writeKv((1L to 40L).map(k => k -> k.toDouble), s"$root/fa")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, fa), numBits = 256, numHashes = 3)
    // the row-lineage counter is the format's own bookkeeping and rides
    // every props map; user-visible props are everything else
    def userProps(p: Map[String, String]) = p - TableFormat.NextRowIdProp
    assert(userProps(TableFormat.snapshot(spark, root).props).isEmpty)
    // a props-bearing commit (the streaming appender's replay gate shape),
    // including characters the JSON escaper must handle
    val s2 = TableFormat.commitTransform(spark, root, "k", 256, 3,
      cur => cur.get.files,
      deriveProps = _ => Map("batch_id" -> "7", "lineage" -> """ck"pt\path"""))
    assert(userProps(s2.props) ==
      Map("batch_id" -> "7", "lineage" -> """ck"pt\path"""))
    // a custom deriveProps that DROPPED the counter must not reset it
    // (id ranges are burned, never reused)
    assert(s2.props(TableFormat.NextRowIdProp).toLong == 40L)
    assert(TableFormat.snapshot(spark, root, Some(2L)).props == s2.props)
    // compaction and targeted delete preserve the properties (the default
    // deriveProps), so a maintenance commit can never erase the gate
    val s3 = TableFormat.compact(spark, root, root, nFiles = 1)
    assert(userProps(s3.props) == userProps(s2.props))
    val s4 = TableFormat.deleteKeys(spark, root, root, Seq(5L))
    assert(userProps(s4.props) == userProps(s2.props))
    // v1 (pre-user-props) parses with only the lineage bookkeeping
    assert(userProps(TableFormat.snapshot(spark, root, Some(1L)).props).isEmpty)
  }

  test("schema evolution: widened append, null back-fill, as-of keeps the old schema") {
    import spark.implicits._
    val root = freshRoot()
    val fa = writeKv(Seq(1L -> 10.0, 2L -> 20.0), s"$root/fa")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, fa), numBits = 256, numHashes = 3)
    // widened append: new `tag` column joins the schema, nothing rewrites
    Seq((30L, 30.0, "x")).toDF("k", "v", "tag")
      .repartition(1).write.mode("overwrite").parquet(s"$root/fb")
    val s2 = TableFormat.appendFiles(spark, root, TableFormat.listParquet(spark, s"$root/fb"))
    assert(s2.schemaDdl.exists(_.contains("tag")))
    val latest = TableFormat.read(spark, TableFormat.snapshot(spark, root))
    assert(latest.columns.toSeq == Seq("k", "v", "tag"))
    val rows = latest.select("k", "tag").as[(Long, Option[String])]
      .collect().toMap
    assert(rows == Map(1L -> None, 2L -> None, 30L -> Some("x")),
      "pre-evolution files must read the new column as null")
    // as-of v1 reads the ORIGINAL two-column schema
    assert(TableFormat.read(spark, TableFormat.snapshot(spark, root, Some(1L)))
      .columns.toSeq == Seq("k", "v"))
    // zone-pruned range scan honors the evolved schema too
    val (scan, _, _) = TableFormat.scanRange(spark,
      TableFormat.snapshot(spark, root), 1L, 2L)
    assert(scan.columns.toSeq == Seq("k", "v", "tag"))
    // type changes are rejected add-only evolution
    Seq((40L, "not-a-double")).toDF("k", "v")
      .repartition(1).write.mode("overwrite").parquet(s"$root/fc")
    intercept[IllegalArgumentException] {
      TableFormat.appendFiles(spark, root, TableFormat.listParquet(spark, s"$root/fc"))
    }
    // compaction under the evolved schema preserves content incl. back-fill
    TableFormat.compact(spark, root, root, nFiles = 1)
    val after = TableFormat.read(spark, TableFormat.snapshot(spark, root))
      .select("k", "tag").as[(Long, Option[String])].collect().toMap
    assert(after == rows)
  }

  test("expireSnapshots: retention horizon + orphan sweep never touch survivors") {
    import spark.implicits._
    val root = freshRoot()
    // v1: two files; v2: compaction rewrite (c0); v3: delete rewrite
    val fa = writeKv((1L to 20L).map(k => k -> k.toDouble), s"$root/fa")
    val fb = writeKv((30L to 40L).map(k => k -> k.toDouble), s"$root/fb")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, fa) ++ TableFormat.listParquet(spark, fb),
      numBits = 256, numHashes = 3)
    TableFormat.compact(spark, root, root, nFiles = 1)
    TableFormat.deleteKeys(spark, root, root, Seq(5L))
    // an orphan from a crashed append attempt: data written, never committed
    writeKv(Seq(99L -> 0.0), s"$root/orphan")
    val before = TableFormat.read(spark, TableFormat.snapshot(spark, root))
      .select("k").as[Long].collect().toSet
    // graceMs = 0 is the quiesced-ingest sweep; the DEFAULT is an hour so
    // a concurrent commit's fresh files can never look orphaned
    val (expired, removed) = TableFormat.expireSnapshots(spark, root,
      keepLast = 2, dataDirs = Seq(root), graceMs = 0L)
    assert(expired == Seq(1L))
    assert(TableFormat.versions(spark, root) == Seq(2L, 3L))
    // v1's exclusive files (fa/fb) and the orphan are gone; survivors intact
    assert(removed.exists(_.contains("/fa/")) && removed.exists(_.contains("/fb/")))
    assert(removed.exists(_.contains("/orphan/")))
    assert(TableFormat.read(spark, TableFormat.snapshot(spark, root))
      .select("k").as[Long].collect().toSet == before)
    assert(TableFormat.read(spark, TableFormat.snapshot(spark, root, Some(2L)))
      .count() == 31L)
    intercept[IllegalArgumentException] {
      TableFormat.snapshot(spark, root, Some(1L)) // expired horizon
    }
    // grace window: a fresh unreferenced file survives the sweep
    writeKv(Seq(98L -> 0.0), s"$root/inflight")
    val (_, removed2) = TableFormat.expireSnapshots(spark, root,
      keepLast = 2, dataDirs = Seq(root), graceMs = 3600000L)
    assert(!removed2.exists(_.contains("/inflight/")))
    val (_, removed3) = TableFormat.expireSnapshots(spark, root,
      keepLast = 2, dataDirs = Seq(root), graceMs = 0L)
    assert(removed3.exists(_.contains("/inflight/")))
  }

  test("expireSnapshots age retention: young commits survive keep_last, " +
      "old ones expire") {
    val root = freshRoot()
    (1 to 4).foreach { i =>
      val f = writeKv(Seq(i.toLong -> i.toDouble), s"$root/w$i")
      if (i == 1) TableFormat.commitFiles(spark, root, "k",
        TableFormat.listParquet(spark, f), 256, 3)
      else TableFormat.appendFiles(spark, root,
        TableFormat.listParquet(spark, f))
    }
    // a week-long horizon protects every candidate: nothing expires even
    // at keep_last=1 (the "keep 7 days" operational shape)
    val (e1, _) = TableFormat.expireSnapshots(spark, root, keepLast = 1,
      dataDirs = Seq(root), graceMs = 3600000L, olderThanMs = 7L * 86400000)
    assert(e1.isEmpty, e1)
    assert(TableFormat.versions(spark, root) == Seq(1L, 2L, 3L, 4L))
    // a 1 ms horizon (after letting the clock tick) expires them all
    Thread.sleep(50)
    val (e2, _) = TableFormat.expireSnapshots(spark, root, keepLast = 1,
      dataDirs = Seq(root), graceMs = 3600000L, olderThanMs = 1L)
    assert(e2 == Seq(1L, 2L, 3L), e2)
    assert(TableFormat.versions(spark, root) == Seq(4L))
  }

  test("a full purge leaves a readable zero-file snapshot (typed empty frame)") {
    import spark.implicits._
    val root = freshRoot()
    val fa = writeKv(Seq(1L -> 10.0, 2L -> 20.0), s"$root/fa")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, fa), numBits = 256, numHashes = 3)
    TableFormat.deleteKeys(spark, root, root, Seq(1L, 2L)) // every row
    val snap = TableFormat.snapshot(spark, root)
    assert(snap.files.isEmpty)
    val df = TableFormat.read(spark, snap)
    assert(df.columns.toSeq == Seq("k", "v") && df.count() == 0L)
    // the empty table accepts a fresh append and reads again
    val fb = writeKv(Seq(9L -> 90.0), s"$root/fb")
    TableFormat.appendFiles(spark, root, TableFormat.listParquet(spark, fb))
    assert(TableFormat.read(spark, TableFormat.snapshot(spark, root))
      .select("k").as[Long].collect().toSeq == Seq(9L))
  }

  test("model-based: random append/delete/compact sequences preserve every version") {
    // seeded random op sequences checked against a plain in-memory model:
    // after the whole sequence, EVERY committed version must still read
    // exactly the model's content for that point in history (snapshot
    // isolation + schema evolution + delete/compact correctness in one
    // invariant), and a zone range scan must equal the model filter while
    // never reading more files than the snapshot lists
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val root = freshRoot()
      var nextKey = 1L
      var cur = Map.empty[Long, (Long, Option[String])]
      var history = Vector.empty[(Map[Long, (Long, Option[String])], Boolean)]
      var tagged = false // has the schema ever widened to carry `tag`
      def freshRows(n: Int, withTag: Boolean): Seq[(Long, Long, Option[String])] =
        (1 to n).map { _ =>
          val k = nextKey; nextKey += 1
          (k, rnd.nextInt(100).toLong,
            if (withTag) Some(s"t${rnd.nextInt(3)}") else None)
        }
      def writeRows(rows: Seq[(Long, Long, Option[String])], withTag: Boolean,
                    dir: String): Seq[String] = {
        if (withTag) rows.map(r => (r._1, r._2, r._3.orNull))
          .toDF("k", "q", "tag").repartition(1)
          .write.mode("overwrite").parquet(dir)
        else rows.map(r => (r._1, r._2)).toDF("k", "q").repartition(1)
          .write.mode("overwrite").parquet(dir)
        TableFormat.listParquet(spark, dir)
      }
      val rows0 = freshRows(8, withTag = false)
      TableFormat.commitFiles(spark, root, "k",
        writeRows(rows0, withTag = false, s"$root/w0"), 256, 3)
      cur = rows0.map(r => r._1 -> ((r._2, r._3))).toMap
      history :+= ((cur, tagged))
      for (op <- 1 to 5) {
        rnd.nextInt(3) match {
          case 0 =>
            val withTag = rnd.nextBoolean()
            val rows = freshRows(1 + rnd.nextInt(5), withTag)
            TableFormat.appendFiles(spark, root,
              writeRows(rows, withTag, s"$root/w$op"))
            tagged ||= withTag
            cur ++= rows.map(r => r._1 -> ((r._2, r._3)))
          case 1 =>
            // keep at least one row alive so every version stays readable
            val keys = rnd.shuffle(cur.keys.toSeq.sorted)
              .take(math.min(4, cur.size - 1))
            if (keys.nonEmpty) {
              TableFormat.deleteKeys(spark, root, root, keys)
              cur --= keys
            } else TableFormat.compact(spark, root, root, 1)
          case 2 =>
            TableFormat.compact(spark, root, root, 1 + rnd.nextInt(2))
        }
        history :+= ((cur, tagged))
      }
      val vs = TableFormat.versions(spark, root)
      assert(vs == (1L to history.size.toLong), s"version ids $vs")
      vs.zip(history).foreach { case (v, (model, hadTag)) =>
        val snap = TableFormat.snapshot(spark, root, Some(v))
        val df = TableFormat.read(spark, snap)
        val got: Map[Long, (Long, Option[String])] =
          if (!hadTag) {
            assert(df.columns.toSeq == Seq("k", "q"), s"v$v schema")
            df.as[(Long, Long)].collect().toMap.map { case (k, q) => k -> ((q, None)) }
          } else {
            assert(df.columns.toSeq == Seq("k", "q", "tag"), s"v$v schema")
            df.as[(Long, Long, Option[String])].collect()
              .map(r => r._1 -> ((r._2, r._3))).toMap
          }
        assert(got == model, s"v$v content mismatch")
        // zone range scan vs the model filter; pruning never over-reads
        val keys = model.keys
        val (lo, hi) = (keys.min + (keys.max - keys.min) / 4,
          keys.min + (keys.max - keys.min) / 2)
        val (scan, nRead, nTotal) = TableFormat.scanRange(spark, snap, lo, hi)
        assert(nRead <= nTotal)
        assert(scan.select("k").as[Long].collect().toSet ==
          model.keys.filter(k => k >= lo && k <= hi).toSet, s"v$v range scan")
      }
    }
  }

  test("snapshotAsOfTime resolves the latest commit at or before the instant") {
    val root = freshRoot()
    val fa = writeKv(Seq(1L -> 10.0), s"$root/fa")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, fa), numBits = 256, numHashes = 3)
    val t1 = new java.io.File(s"$root/_log").listFiles()
      .filter(_.getName.endsWith(".json")).map(_.lastModified).max
    Thread.sleep(1100) // local-fs mtime granularity can be one second
    TableFormat.compact(spark, root, root, nFiles = 1)
    assert(TableFormat.snapshotAsOfTime(spark, root, t1).version == 1L)
    assert(TableFormat.snapshotAsOfTime(spark, root,
      System.currentTimeMillis()).version == 2L)
    intercept[IllegalArgumentException] {
      TableFormat.snapshotAsOfTime(spark, root, t1 - 3600000L)
    }
  }

  test("mergeRows: rewrites only touched files, carries the rest, inserts unmatched") {
    import spark.implicits._
    val root = freshRoot()
    val files = Seq(0, 1, 2).flatMap { b =>
      val f = writeKv((0L until 100L).map(i => (b * 1000L + i, 1.0)), s"$root/m$b")
      TableFormat.listParquet(spark, f)
    }
    val s1 = TableFormat.commitFiles(spark, root, "k", files, 1 << 12, 3)
    val source = Seq(1005L -> 9.9, 1010L -> 8.8, 5000L -> 7.7).toDF("k", "v")
    val (s2, rw, car) = TableFormat.mergeRows(spark, root, root, source)
    assert(s2.version == 2L && s2.op.contains("merge"))
    assert(rw == 1 && car == 2, s"rewritten=$rw carried=$car")
    // untouched files carried with IDENTICAL paths (no re-read, no rewrite)
    val untouched = s1.files.filter(f => f.maxKey < 1000L || f.minKey > 1099L)
      .map(_.file).toSet
    assert(untouched.subsetOf(s2.files.map(_.file).toSet))
    val got = TableFormat.read(spark, s2)
    assert(got.count() == 301L) // 300 original + 1 insert, updates in place
    val byKey = got.as[(Long, Double)].collect().toMap
    assert(byKey(1005L) == 9.9 && byKey(1010L) == 8.8 && byKey(5000L) == 7.7)
    assert(byKey(1004L) == 1.0 && byKey(4L) == 1.0)
    // v1 still reads pre-merge content (history survives)
    assert(TableFormat.read(spark,
      TableFormat.snapshot(spark, root, Some(1L))).count() == 300L)
    // pure insert: no key matches -> zero rewrites, all files carried
    val (s3, rw3, car3) = TableFormat.mergeRows(spark, root, root,
      Seq(9000L -> 1.0).toDF("k", "v"))
    assert(rw3 == 0 && car3 == s2.files.size)
    assert(TableFormat.read(spark, s3).count() == 302L)
    // ANSI cardinality rule: duplicate source keys are refused
    val e = intercept[IllegalArgumentException] {
      TableFormat.mergeRows(spark, root, root,
        Seq(7L -> 1.0, 7L -> 2.0).toDF("k", "v"))
    }
    assert(e.getMessage.contains("duplicate source key"))
    // empty source is a committed no-op (same snapshot back, no new version)
    val before = TableFormat.versions(spark, root)
    val (s4, _, _) = TableFormat.mergeRows(spark, root, root,
      Seq.empty[(Long, Double)].toDF("k", "v"))
    assert(s4.version == s3.version && TableFormat.versions(spark, root) == before)
    // mismatched source columns are refused
    intercept[IllegalArgumentException] {
      TableFormat.mergeRows(spark, root, root, Seq((1L, 1.0, "x")).toDF("k", "v", "w"))
    }
  }

  test("rollback republishes the target file set as a NEW commit; history intact") {
    val root = freshRoot()
    val fa = writeKv((1L to 50L).map(k => k -> k.toDouble), s"$root/fa")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, fa), numBits = 256, numHashes = 3)
    TableFormat.deleteKeys(spark, root, root, Seq(5L, 6L, 7L))
    val s3 = TableFormat.rollback(spark, root, 1L)
    assert(s3.version == 3L && s3.op.contains("rollback"))
    assert(TableFormat.versions(spark, root) == Seq(1L, 2L, 3L))
    assert(TableFormat.read(spark, s3).count() == 50L)
    // the rolled-back-over delete is still readable as history
    assert(TableFormat.read(spark,
      TableFormat.snapshot(spark, root, Some(2L))).count() == 47L)
    // rollback is pure metadata: v3 lists exactly v1's files
    assert(s3.files.map(_.file) ==
      TableFormat.snapshot(spark, root, Some(1L)).files.map(_.file))
  }

  test("changesBetween: appends/deletes emitted, replace skipped, rollback re-inserts") {
    import spark.implicits._
    val root = freshRoot()
    val fa = writeKv((0L until 100L).map(i => (i, 1.0)), s"$root/fa")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, fa), numBits = 1 << 12, numHashes = 3)
    val fb = writeKv((200L until 250L).map(i => (i, 2.0)), s"$root/fb")
    TableFormat.appendFiles(spark, root, TableFormat.listParquet(spark, fb)) // v2
    TableFormat.deleteKeys(spark, root, root, Seq(5L, 207L))                 // v3
    TableFormat.compact(spark, root, root, nFiles = 2)                       // v4
    TableFormat.rollback(spark, root, 2L)                                    // v5
    // op audit trail in the log itself
    assert((1L to 5L).map(v =>
      TableFormat.snapshot(spark, root, Some(v)).op.get) ==
      Seq("append", "append", "delete", "replace", "rollback"))
    val ch = TableFormat.changesBetween(spark, root, 1L, 5L)
      .as[(Long, String, Long, Double)].collect().toSet
    val expected =
      (200L until 250L).map(k => (2L, "insert", k, 2.0)).toSet ++
        Set((3L, "delete", 5L, 1.0), (3L, "delete", 207L, 2.0),
          (5L, "insert", 5L, 1.0), (5L, "insert", 207L, 2.0))
    assert(ch == expected)
    // the replace step alone reads NOTHING and yields an empty changelog
    assert(TableFormat.changesBetween(spark, root, 3L, 4L).count() == 0L)
    // delete step alone: only the deleted rows, never the rewritten survivors
    assert(TableFormat.changesBetween(spark, root, 2L, 3L)
      .as[(Long, String, Long, Double)].collect().toSet ==
      Set((3L, "delete", 5L, 1.0), (3L, "delete", 207L, 2.0)))
  }

  test("refreshView: changelog-advanced aggregate equals the full recompute") {
    import spark.implicits._
    val root = freshRoot()
    val fa = writeKv((0L until 100L).map(i => (i, (i % 10).toDouble)), s"$root/fa")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, fa), numBits = 1 << 12, numHashes = 3)
    val v1 = TableFormat.snapshot(spark, root)
    def viewOf(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(pmod(col("k"), lit(4)).as("grp"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("v").cast("long")).as("total"))
    val base = viewOf(TableFormat.read(spark, v1))
    val fb = writeKv((200L until 230L).map(i => (i, 5.0)), s"$root/fb")
    TableFormat.appendFiles(spark, root, TableFormat.listParquet(spark, fb)) // v2
    TableFormat.deleteKeys(spark, root, root, Seq(3L, 17L, 202L))            // v3
    TableFormat.compact(spark, root, root, nFiles = 2)                       // v4
    TableFormat.mergeRows(spark, root, root,                                 // v5
      Seq(8L -> 99.0, 9000L -> 7.0).toDF("k", "v"))
    val got = TableFormat.refreshView(spark, root, 1L, 5L,
      pmod(col("k"), lit(4)), col("v").cast("long"), base)
      .as[(Long, Long, Long)].collect().toSet
    val full = viewOf(TableFormat.read(spark, TableFormat.snapshot(spark, root)))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == full)
    // a group emptied by deletes must drop out, not linger at zero: delete
    // every key of group 1 mod 4 among the small keys, then re-check
    val g1keys = (0L until 100L).filter(k => k % 4 == 1 && k != 17L) ++
      (200L until 230L).filter(k => k % 4 == 1 && k != 202L) :+ 9000L
    // 9000 % 4 = 0, so group 1 empties only if we delete its members
    TableFormat.deleteKeys(spark, root, root,
      g1keys.filter(_ % 4 == 1))                                             // v6
    val got2 = TableFormat.refreshView(spark, root, 1L, 6L,
      pmod(col("k"), lit(4)), col("v").cast("long"), base)
      .as[(Long, Long, Long)].collect().toSet
    val full2 = viewOf(TableFormat.read(spark, TableFormat.snapshot(spark, root)))
      .as[(Long, Long, Long)].collect().toSet
    assert(got2 == full2)
    assert(!got2.exists(_._1 == 1L), "emptied group must drop out of the view")
  }

  test("changesBetween unions by name across schema evolution (old rows null-fill)") {
    import spark.implicits._
    val root = freshRoot()
    val fa = writeKv(Seq(1L -> 1.0, 2L -> 2.0), s"$root/fa")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, fa), numBits = 256, numHashes = 3)
    Seq((9L, 9.0, "x")).toDF("k", "v", "tag")
      .repartition(1).write.mode("overwrite").parquet(s"$root/fb")
    TableFormat.appendFiles(spark, root, TableFormat.listParquet(spark, s"$root/fb")) // v2
    TableFormat.deleteKeys(spark, root, root, Seq(1L)) // v3: rewrites a PRE-evolution file
    val ch = TableFormat.changesBetween(spark, root, 1L, 3L)
      .as[(Long, String, Long, Double, Option[String])].collect().toSet
    assert(ch == Set((2L, "insert", 9L, 9.0, Some("x")),
      (3L, "delete", 1L, 1.0, None)))
  }

  test("maintainView: bootstrap, incremental advance, idempotent tick, crash-window resume") {
    import spark.implicits._
    val srcRoot = freshRoot()
    val viewRoot = freshRoot()
    val grp = pmod(col("k"), lit(4))
    val value = col("v").cast("long")
    def fullView() = TableFormat
      .read(spark, TableFormat.snapshot(spark, srcRoot))
      .groupBy(grp.as("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(value).as("total"))
      .as[(Long, Long, Long)].collect().toSet
    def viewNow() = TableFormat
      .read(spark, TableFormat.snapshot(spark, viewRoot))
      .select("grp", "n_rows", "total")
      .as[(Long, Long, Long)].collect().toSet
    val fa = writeKv((0L until 80L).map(i => (i, (i % 7).toDouble)), s"$srcRoot/fa")
    TableFormat.commitFiles(spark, srcRoot, "k",
      TableFormat.listParquet(spark, fa), numBits = 1 << 12, numHashes = 3)
    // bootstrap tick
    val v1 = TableFormat.maintainView(spark, srcRoot, viewRoot, viewRoot, grp, value)
    assert(v1.props("source_version") == "1" && viewNow() == fullView())
    // idempotent tick: no source change -> NO new view commit
    TableFormat.maintainView(spark, srcRoot, viewRoot, viewRoot, grp, value)
    assert(TableFormat.versions(spark, viewRoot) == Seq(1L))
    // source advances: append + delete + compact + merge, one maintenance tick
    val fb = writeKv((100L until 130L).map(i => (i, 3.0)), s"$srcRoot/fb")
    TableFormat.appendFiles(spark, srcRoot, TableFormat.listParquet(spark, fb))
    TableFormat.deleteKeys(spark, srcRoot, srcRoot, Seq(2L, 101L))
    TableFormat.compact(spark, srcRoot, srcRoot, nFiles = 2)
    TableFormat.mergeRows(spark, srcRoot, srcRoot,
      Seq(4L -> 50.0, 9999L -> 1.0).toDF("k", "v"))
    val v2 = TableFormat.maintainView(spark, srcRoot, viewRoot, viewRoot, grp, value)
    assert(v2.props("source_version") == "5" && viewNow() == fullView())
    assert(TableFormat.versions(spark, viewRoot) == Seq(1L, 2L))
    // crash window: source moved, but the tick died before committing the
    // view — the cursor still reads old, and the retry lands exactly once
    TableFormat.deleteKeys(spark, srcRoot, srcRoot, Seq(7L))
    assert(TableFormat.snapshot(spark, viewRoot).props("source_version") == "5")
    TableFormat.maintainView(spark, srcRoot, viewRoot, viewRoot, grp, value)
    assert(viewNow() == fullView())
    assert(TableFormat.snapshot(spark, viewRoot).props("source_version") == "6")
    // the view is itself a TableFormat table: its history time-travels
    assert(TableFormat.read(spark,
      TableFormat.snapshot(spark, viewRoot, Some(1L)))
      .agg(sum(col("n_rows"))).collect()(0).getLong(0) == 80L)
  }

  test("secondary zone stats: scanZone prunes on a non-key column; maintenance preserves bounds") {
    import spark.implicits._
    val root = freshRoot()
    // keys INTERLEAVE across files while t is file-disjoint: key zones
    // can't prune a t-range, the secondary zones can
    def rowsOf(b: Int) = (0L until 100L).map(i => (i * 3 + b, 1.0, b * 1000L + i))
    val files = Seq(0, 1, 2).flatMap { b =>
      rowsOf(b).toDF("k", "v", "t").repartition(1)
        .write.mode("overwrite").parquet(s"$root/z$b")
      TableFormat.listParquet(spark, s"$root/z$b")
    }
    val s1 = TableFormat.commitFiles(spark, root, "k", files, 1 << 12, 3,
      zoneCols = Seq("t"))
    assert(s1.zoneCols == Seq("t"))
    assert(s1.files.forall(_.zones.contains("t")))
    val (scan, nRead, nTotal) = TableFormat.scanZone(spark, s1, "t", 1000L, 1099L)
    assert(nTotal == 3 && nRead == 1, s"read=$nRead total=$nTotal")
    assert(scan.count() == 100L)
    // the key zones CANNOT prune this probe (interleaved), proving the
    // secondary dimension carries information the primary lacks
    assert(s1.files.count(f => f.minKey <= 3000L && f.maxKey >= 0L) == 3)
    // undeclared zone column is an explicit error
    intercept[IllegalArgumentException] {
      TableFormat.scanZone(spark, s1, "v", 0L, 1L)
    }
    // delete rewrites recompute the secondary zones (declaration carries)
    TableFormat.deleteKeys(spark, root, root, Seq(3L + 1L)) // k=4 in file b=1
    val s2 = TableFormat.snapshot(spark, root)
    assert(s2.zoneCols == Seq("t") && s2.files.forall(_.zones.contains("t")))
    val (scan2, nRead2, _) = TableFormat.scanZone(spark, s2, "t", 1000L, 1099L)
    assert(nRead2 == 1 && scan2.count() == 99L)
    // appended files get zones too; a disjoint-range probe reads only them
    (0L until 10L).map(i => (10000L + i, 2.0, 5000L + i)).toDF("k", "v", "t")
      .repartition(1).write.mode("overwrite").parquet(s"$root/z9")
    TableFormat.appendFiles(spark, root, TableFormat.listParquet(spark, s"$root/z9"))
    val s3 = TableFormat.snapshot(spark, root)
    val (scan3, nRead3, nTotal3) = TableFormat.scanZone(spark, s3, "t", 5000L, 5999L)
    assert(nRead3 == 1 && nTotal3 == s3.files.size && scan3.count() == 10L)
    // merge + compact + rollback all carry the declaration and the stats
    TableFormat.mergeRows(spark, root, root, Seq((2L, 9.0, 666L)).toDF("k", "v", "t"))
    TableFormat.compact(spark, root, root, nFiles = 2)
    val s5 = TableFormat.snapshot(spark, root)
    assert(s5.zoneCols == Seq("t") && s5.files.forall(_.zones.contains("t")))
    val (scan5, _, _) = TableFormat.scanZone(spark, s5, "t", 666L, 666L)
    assert(scan5.select("k").as[Long].collect().toSeq == Seq(2L))
    val s6 = TableFormat.rollback(spark, root, s3.version)
    assert(s6.zoneCols == Seq("t"))
    assert(TableFormat.scanZone(spark, s6, "t", 5000L, 5999L)._1.count() == 10L)
  }

  test("tryCommit CAS: the same version cannot be published twice") {
    val root = freshRoot()
    val f = writeKv(Seq(1L -> 1.0), s"$root/x")
    val stats = TableFormat.fileStats(spark, TableFormat.listParquet(spark, f),
      "k", 256, 3)
    assert(TableFormat.tryCommit(spark, root, 1L, "k", 256, 3, stats))
    assert(!TableFormat.tryCommit(spark, root, 1L, "k", 256, 3, stats))
    assert(TableFormat.versions(spark, root) == Seq(1L))
  }

  test("branch fork/publish: staged work invisible to main until fast-forward") {
    val root = freshRoot()
    writeKv(Seq(1L -> 1.0, 2L -> 2.0), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)
    val b = TableFormat.createBranch(spark, root, "wap")
    val broot = TableFormat.branchRoot(root, "wap")
    // the branch log continues main's numbering: fork commit = v2
    assert(b.version == 2L && b.props("branch.forked_from") == "1")
    // the fork is metadata-only: parent files carried by reference
    assert(b.files.map(_.file) ==
      TableFormat.snapshot(spark, root).files.map(_.file))
    // staged append lands on the branch log; main readers never see it
    writeKv(Seq(3L -> 3.0, 4L -> -4.0), s"$broot/stage")
    TableFormat.appendFiles(spark, broot,
      TableFormat.listParquet(spark, s"$broot/stage"))
    assert(TableFormat.versions(spark, root) == Seq(1L))
    assert(TableFormat.read(spark, TableFormat.snapshot(spark, root)).count() == 2L)
    assert(TableFormat.read(spark, TableFormat.snapshot(spark, broot)).count() == 4L)
    // audit repair on the branch, then fast-forward publish onto main
    TableFormat.deleteKeys(spark, broot, broot, Seq(4L))
    val pub = TableFormat.publishBranch(spark, root, "wap")
    assert(pub.version == 2L && !pub.props.contains("branch.forked_from"))
    val mainRows = TableFormat.read(spark, TableFormat.snapshot(spark, root))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(mainRows == Seq(1L -> 1.0, 2L -> 2.0, 3L -> 3.0))
    // main history intact: v1 still resolves the pre-branch state
    assert(TableFormat.read(spark,
      TableFormat.snapshot(spark, root, Some(1L))).count() == 2L)
    // drop removes the branch LOG and sweeps unreferenced staged files;
    // the published main commit (which references branch-root paths) is
    // unaffected and still reads
    TableFormat.dropBranch(spark, root, "wap")
    assert(TableFormat.versions(spark, broot).isEmpty)
    assert(TableFormat.read(spark, TableFormat.snapshot(spark, root)).count() == 3L)
  }

  test("dropBranch sweeps staged files of an unpublished branch; published files survive; nested branches refuse") {
    val root = freshRoot()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetUnder(p: String): Seq[String] = {
      val path = new org.apache.hadoop.fs.Path(p)
      if (!fs.exists(path)) Seq.empty
      else {
        val it = fs.listFiles(path, true)
        val out = Seq.newBuilder[String]
        while (it.hasNext) {
          val st = it.next()
          if (st.getPath.getName.endsWith(".parquet"))
            out += st.getPath.toString
        }
        out.result()
      }
    }
    writeKv(Seq(1L -> 1.0, 2L -> 2.0), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)          // main v1
    // ---- branch A: staged work, never published ----
    TableFormat.createBranch(spark, root, "a")
    val aRoot = TableFormat.branchRoot(root, "a")
    writeKv(Seq(10L -> 10.0), s"$aRoot/stage")
    TableFormat.appendFiles(spark, aRoot,
      TableFormat.listParquet(spark, s"$aRoot/stage"))
    assert(parquetUnder(aRoot).nonEmpty)
    val (removedA, keptA) = TableFormat.dropBranch(spark, root, "a")
    assert(removedA >= 1 && keptA == 0, s"($removedA, $keptA)")
    // ZERO unreachable files: the whole branch subtree is gone
    assert(!fs.exists(new org.apache.hadoop.fs.Path(aRoot)))
    assert(TableFormat.read(spark, TableFormat.snapshot(spark, root))
      .count() == 2L)
    // ---- branch B: staged work, PUBLISHED, then dropped ----
    TableFormat.createBranch(spark, root, "b")
    val bRoot = TableFormat.branchRoot(root, "b")
    writeKv(Seq(20L -> 20.0), s"$bRoot/stage")
    TableFormat.appendFiles(spark, bRoot,
      TableFormat.listParquet(spark, s"$bRoot/stage"))
    TableFormat.publishBranch(spark, root, "b")
    val (removedB, keptB) = TableFormat.dropBranch(spark, root, "b")
    // main references the published file at its _branch/b path: kept
    assert(keptB >= 1, s"($removedB, $keptB)")
    assert(parquetUnder(bRoot).nonEmpty)
    assert(TableFormat.read(spark, TableFormat.snapshot(spark, root))
      .orderBy("k").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 20L))
    // every surviving parquet under the table is reachable: a zero-grace
    // retention sweep of the main log (which skips _branch wholesale)
    // plus the branch sweeps leave no file outside some live log
    val live = TableFormat.versions(spark, root).flatMap(v =>
      TableFormat.snapshot(spark, root, Some(v)).files.map(f =>
        new org.apache.hadoop.fs.Path(f.file).toUri.getPath)).toSet
    val onDisk = parquetUnder(s"$root/_branch").map(p =>
      new org.apache.hadoop.fs.Path(p).toUri.getPath)
    assert(onDisk.forall(live.contains), onDisk.filterNot(live.contains))
    // ---- nested branches: dropping the parent is refused loudly ----
    TableFormat.createBranch(spark, root, "c")
    val cRoot = TableFormat.branchRoot(root, "c")
    TableFormat.createBranch(spark, cRoot, "inner")
    val e = intercept[IllegalArgumentException](
      TableFormat.dropBranch(spark, root, "c"))
    assert(e.getMessage.contains("nested"), e.getMessage)
    TableFormat.dropBranch(spark, cRoot, "inner")
    val (_, keptC) = TableFormat.dropBranch(spark, root, "c")
    assert(keptC == 0 && !fs.exists(new org.apache.hadoop.fs.Path(cRoot)))
  }

  test("publishBranch conflict: main advanced since the fork -> publish fails") {
    val root = freshRoot()
    writeKv(Seq(1L -> 1.0), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)
    TableFormat.createBranch(spark, root, "wap")
    // duplicate branch name is an explicit error, not a silent reset
    intercept[IllegalArgumentException](
      TableFormat.createBranch(spark, root, "wap"))
    // another writer advances main after the fork
    writeKv(Seq(9L -> 9.0), s"$root/w2")
    TableFormat.appendFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/w2"))
    val e = intercept[java.util.ConcurrentModificationException](
      TableFormat.publishBranch(spark, root, "wap"))
    assert(e.getMessage.contains("re-fork"))
    // the failed publish left no commit on main
    assert(TableFormat.versions(spark, root) == Seq(1L, 2L))
    // a log without fork metadata cannot be published as a branch
    val raw = TableFormat.branchRoot(root, "raw")
    writeKv(Seq(5L -> 5.0), s"$raw/w")
    TableFormat.commitFiles(spark, raw, "k",
      TableFormat.listParquet(spark, s"$raw/w"), 256, 3)
    intercept[IllegalStateException](
      TableFormat.publishBranch(spark, root, "raw"))
    // path traversal in a branch name is rejected before any IO
    intercept[IllegalArgumentException](
      TableFormat.branchRoot(root, "../evil"))
  }

  test("rebaseBranch re-forks a diverged branch onto main's head: the " +
      "publish then fast-forwards; overlapping touched files refuse; " +
      "staged row ids re-range past both counters") {
    val root = freshRoot()
    writeKv((0L until 50L).map(k => k -> k * 1.0), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)
    TableFormat.createBranch(spark, root, "wap")
    val broot = TableFormat.branchRoot(root, "wap")
    // branch stages an append (the audit flow)
    writeKv((100L until 130L).map(k => k -> k * 1.0), s"$broot/s1")
    TableFormat.appendFiles(spark, broot,
      TableFormat.listParquet(spark, s"$broot/s1"))
    // main keeps ingesting: two appends past the fork
    writeKv((50L until 80L).map(k => k -> k * 1.0), s"$root/w2")
    TableFormat.appendFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/w2"))
    writeKv((80L until 90L).map(k => k -> k * 1.0), s"$root/w3")
    TableFormat.appendFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/w3"))
    // fast-forward refuses; rebase composes (append-only branch)
    intercept[java.util.ConcurrentModificationException](
      TableFormat.publishBranch(spark, root, "wap"))
    val (reb, reborn, carried) = TableFormat.rebaseBranch(spark, root, "wap")
    assert(reborn == 1 && carried == 3, s"$reborn/$carried")
    assert(reb.props("branch.forked_from").toLong == 3L)
    // staged ids re-ranged past BOTH lines' counters: no collisions
    val pub = TableFormat.publishBranch(spark, root, "wap")
    val ids = TableFormat.read(spark, pub)
      .select(org.apache.spark.sql.functions.col("k"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == ((0L until 90L) ++ (100L until 130L)).sorted)
    val main = TableFormat.snapshot(spark, root)
    val rids = main.files.filter(_.rid >= 0)
      .flatMap(f => f.rid until (f.rid + f.nRows))
    assert(rids.distinct.size == rids.size, "row-id ranges collide")

    // overlapping touched files refuse: branch deletes a fork-point key
    // while main rewrites the same file
    val root2 = freshRoot()
    writeKv((0L until 40L).map(k => k -> k * 1.0), s"$root2/w1")
    TableFormat.commitFiles(spark, root2, "k",
      TableFormat.listParquet(spark, s"$root2/w1"), 256, 3)
    TableFormat.createBranch(spark, root2, "fix")
    TableFormat.deleteKeys(spark, TableFormat.branchRoot(root2, "fix"),
      s"${TableFormat.branchRoot(root2, "fix")}/data", Seq(7L))
    TableFormat.deleteKeys(spark, root2, s"$root2/data", Seq(9L))
    val e = intercept[TableFormat.CommitConflictException](
      TableFormat.rebaseBranch(spark, root2, "fix"))
    assert(e.getMessage.contains("both touched"), e.getMessage)
  }

  test("statsSummary and countRange: metadata-exact, boundary-only scanning") {
    import spark.implicits._
    val root = freshRoot()
    // four disjoint key files: [0,99] [100,199] [200,299] [300,399]
    val files = (0 to 3).flatMap { bkt =>
      TableFormat.listParquet(spark, writeKv(
        (0L until 100L).map(i => (bkt * 100L + i, i * 1.0)), s"$root/f$bkt"))
    }
    val snap = TableFormat.commitFiles(spark, root, "k", files, 1024, 3)
    assert(TableFormat.statsSummary(snap) == ((400L, 0L, 399L)))
    // [50,299]: f0 boundary (scanned), f1/f2 inside (metadata), f3 skipped
    assert(TableFormat.countRange(spark, snap, "k", 50L, 299L) ==
      ((250L, 2, 1, 1)))
    // whole-table range answers with zero scanning
    assert(TableFormat.countRange(spark, snap, "k", 0L, 399L) ==
      ((400L, 4, 0, 0)))
    // empty-intersection range skips everything
    assert(TableFormat.countRange(spark, snap, "k", 5000L, 6000L) ==
      ((0L, 0, 0, 4)))
    // secondary zone column: same arithmetic on declared per-file bounds
    val root2 = freshRoot()
    val files2 = (0 to 1).flatMap { bkt =>
      val f = s"$root2/f$bkt"
      (0L until 50L).map(i => (bkt * 50L + i, 1.0, bkt * 1000L + i))
        .toDF("k", "v", "z").repartition(1).write.mode("overwrite").parquet(f)
      TableFormat.listParquet(spark, f)
    }
    val snap2 = TableFormat.commitFiles(spark, root2, "k", files2, 256, 3,
      zoneCols = Seq("z"))
    assert(TableFormat.countRange(spark, snap2, "z", 1000L, 1049L) ==
      ((50L, 1, 0, 1)))
    // a file LACKING bounds for the zone column is scanned, never guessed
    val stripped = snap2.copy(files = snap2.files.map { f =>
      if (f.zones("z")._1 == 1000L) f.copy(zones = Map.empty) else f })
    assert(TableFormat.countRange(spark, stripped, "z", 1000L, 1049L) ==
      ((50L, 0, 1, 1)))
  }

  test("merge-on-read delete: no rewrite, seq-scoped manifests, compact materializes") {
    val root = freshRoot()
    writeKv(Seq(1L -> 1.0, 2L -> 2.0, 3L -> 3.0), s"$root/w1")
    val s1 = TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)
    val s2 = TableFormat.deleteKeysMoR(spark, root, root, Seq(2L))
    // zero data rewrite: every data file carried by reference
    assert(s2.files.map(_.file) == s1.files.map(_.file))
    assert(s2.deletes.map(d => (d.nKeys, d.seq)) == Seq((1L, 2L)))
    def content(v: Long) = TableFormat
      .read(spark, TableFormat.snapshot(spark, root, Some(v)))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(content(2L) == Seq(1L -> 1.0, 3L -> 3.0))
    assert(content(1L) == Seq(1L -> 1.0, 2L -> 2.0, 3L -> 3.0)) // time travel
    // sequence scoping: a re-appended key is NEWER than the manifest
    writeKv(Seq(2L -> 9.0), s"$root/w2")
    TableFormat.appendFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/w2"))
    assert(content(3L) == Seq(1L -> 1.0, 2L -> 9.0, 3L -> 3.0))
    // a later manifest kills the resurrected row too (it IS older than it)
    TableFormat.deleteKeysMoR(spark, root, root, Seq(2L, 3L))
    assert(content(4L) == Seq(1L -> 1.0))
    // metadata stats refuse to answer under manifests (counts are stale)
    intercept[IllegalArgumentException](
      TableFormat.statsSummary(TableFormat.snapshot(spark, root)))
    // compaction materializes the deletes and clears the manifest set
    val s5 = TableFormat.compact(spark, root, root, 1)
    assert(s5.deletes.isEmpty && content(5L) == Seq(1L -> 1.0))
    assert(TableFormat.statsSummary(s5) == ((1L, 1L, 1L)))
    // rollback across the MoR boundary restores the manifest set too
    val s6 = TableFormat.rollback(spark, root, 4L)
    assert(s6.deletes.map(_.seq) == Seq(2L, 4L) && content(6L) == Seq(1L -> 1.0))
    val s7 = TableFormat.rollback(spark, root, 1L)
    assert(s7.deletes.isEmpty &&
      content(7L) == Seq(1L -> 1.0, 2L -> 2.0, 3L -> 3.0))
  }

  test("changelog and IVM flow through merge-on-read deletes") {
    val root = freshRoot()
    writeKv(Seq(1L -> 10.0, 2L -> 20.0, 3L -> 30.0), s"$root/w1")
    TableFormat.commitFiles(spark, root,
      "k", TableFormat.listParquet(spark, s"$root/w1"), 256, 3)
    TableFormat.deleteKeysMoR(spark, root, root, Seq(2L))        // v2
    writeKv(Seq(2L -> 25.0), s"$root/w2")
    TableFormat.appendFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/w2"))               // v3
    TableFormat.deleteKeysMoR(spark, root, root, Seq(1L, 2L))    // v4
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("_version", "_change", "k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // v2 emits ONLY the masked row; v4 emits the original k=1 and the
    // resurrected k=2 — never the long-dead original k=2
    assert(rows(TableFormat.changesBetween(spark, root, 1L, 4L)) == Set(
      (2L, "delete", 2L, 20.0), (3L, "insert", 2L, 25.0),
      (4L, "delete", 1L, 10.0), (4L, "delete", 2L, 25.0)))
    // rollback to v1 crosses a manifest boundary: the full-diff fallback
    // emits the restored rows as inserts
    TableFormat.rollback(spark, root, 1L)                        // v5
    assert(rows(TableFormat.changesBetween(spark, root, 4L, 5L)) == Set(
      (5L, "insert", 1L, 10.0), (5L, "insert", 2L, 20.0)))
    // IVM: a view advanced across the MoR chain equals the recompute
    def viewAt(v: Long) = TableFormat
      .read(spark, TableFormat.snapshot(spark, root, Some(v)))
      .groupBy((col("k") % 2).as("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("total"))
    def pinned(df: org.apache.spark.sql.DataFrame) = df.orderBy("grp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val refreshed = TableFormat.refreshView(spark, root, 1L, 4L,
      col("k") % 2, col("v"), viewAt(1L))
    assert(pinned(refreshed) == pinned(viewAt(4L)))
  }

  test("upsertRowsMoR: O(batch) commit equals copy-on-write mergeRows") {
    import spark.implicits._
    val rootA = freshRoot()
    val rootB = freshRoot()
    val base = Seq(1L -> 10.0, 2L -> 20.0, 3L -> 30.0, 4L -> 40.0)
    Seq(rootA, rootB).foreach { r =>
      writeKv(base, s"$r/w1")
      TableFormat.commitFiles(spark, r, "k",
        TableFormat.listParquet(spark, s"$r/w1"), 256, 3)
    }
    val src = Seq(2L -> 25.0, 5L -> 50.0).toDF("k", "v")
    val sU = TableFormat.upsertRowsMoR(spark, rootA, rootA, src)
    TableFormat.mergeRows(spark, rootB, rootB, src)
    def content(root: String, v: Option[Long] = None) = TableFormat
      .read(spark, TableFormat.snapshot(spark, root, v))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Seq(1L -> 10.0, 2L -> 25.0, 3L -> 30.0, 4L -> 40.0, 5L -> 50.0)
    assert(content(rootA) == want && content(rootB) == want)
    // O(batch): the base file is carried by reference, one new data file,
    // one manifest — no touched-file detection ever ran
    assert(sU.files.size == 2 && sU.deletes.map(_.nKeys) == Seq(2L))
    // changelog emits the delete(old)+insert(new) pair, not a rewrite
    val ch = TableFormat.changesBetween(spark, rootA, 1L, 2L)
      .select("_version", "_change", "k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(ch == Set((2L, "insert", 2L, 25.0), (2L, "insert", 5L, 50.0),
      (2L, "delete", 2L, 20.0)))
    // IVM across the upsert equals the recompute
    def viewAt(v: Long) = TableFormat
      .read(spark, TableFormat.snapshot(spark, rootA, Some(v)))
      .groupBy((col("k") % 2).as("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("total"))
    def pinned(df: org.apache.spark.sql.DataFrame) = df.orderBy("grp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pinned(TableFormat.refreshView(spark, rootA, 1L, 2L,
      col("k") % 2, col("v"), viewAt(1L))) == pinned(viewAt(2L)))
    // a second upsert of the same key masks the FIRST upsert's file
    TableFormat.upsertRowsMoR(spark, rootA, rootA,
      Seq(2L -> 29.0).toDF("k", "v"))
    assert(content(rootA) ==
      Seq(1L -> 10.0, 2L -> 29.0, 3L -> 30.0, 4L -> 40.0, 5L -> 50.0))
    assert(content(rootA, Some(2L)) == want) // time travel intact
    // ANSI cardinality: duplicate source keys refuse loudly
    val e = intercept[IllegalArgumentException](
      TableFormat.upsertRowsMoR(spark, rootA, rootA,
        Seq(7L -> 1.0, 7L -> 2.0).toDF("k", "v")))
    assert(e.getMessage.contains("duplicate"))
    // compaction materializes: manifests cleared, content unchanged
    val sc = TableFormat.compact(spark, rootA, rootA, 1)
    assert(sc.deletes.isEmpty && content(rootA) ==
      Seq(1L -> 10.0, 2L -> 29.0, 3L -> 30.0, 4L -> 40.0, 5L -> 50.0))
  }

  test("historyTable and filesTable: pure metadata, stale-by-contract under MoR") {
    val root = freshRoot()
    writeKv(Seq(1L -> 1.0, 2L -> 2.0, 3L -> 3.0), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)
    TableFormat.deleteKeysMoR(spark, root, root, Seq(2L))   // v2: meta stale
    TableFormat.compact(spark, root, root, 1)               // v3: materialized
    val hist = TableFormat.historyTable(spark, root).orderBy("version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(hist == Seq(
      (1L, "append", 1L, 0L, 0L, 3L),
      (2L, "mor-delete", 1L, 1L, 1L, 3L), // meta_rows stays 3: zero data IO
      (3L, "replace", 1L, 0L, 0L, 2L)))
    val ft = TableFormat.filesTable(spark,
      TableFormat.snapshot(spark, root)).collect()
    assert(ft.length == 1)
    val r = ft(0)
    assert(r.getAs[Long]("seq") == 3L && r.getAs[Long]("min_key") == 1L &&
      r.getAs[Long]("max_key") == 3L && r.getAs[Long]("n_rows") == 2L)
  }

  test("materializeDeletes rewrites only manifest-affected files") {
    val root = freshRoot()
    writeKv(Seq(1L -> 1.0, 2L -> 2.0, 3L -> 3.0), s"$root/w1")
    writeKv(Seq(10L -> 10.0, 11L -> 11.0), s"$root/w2")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1") ++
        TableFormat.listParquet(spark, s"$root/w2"), 256, 3)
    val cleanFile = TableFormat.snapshot(spark, root).files
      .find(_.minKey == 10L).get.file
    TableFormat.deleteKeysMoR(spark, root, root, Seq(2L)) // bounds [2,2]
    val (s3, nRe, nCa) = TableFormat.materializeDeletes(spark, root, root,
      nOutFiles = 1)
    // only the [1,3] file overlaps the manifest bounds; [10,11] is carried
    assert(nRe == 1 && nCa == 1 && s3.deletes.isEmpty)
    assert(s3.files.map(_.file).contains(cleanFile))
    assert(TableFormat.read(spark, s3).orderBy("k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L, 10L, 11L))
    // metadata stats answer again after materialization
    assert(TableFormat.statsSummary(s3) == ((4L, 1L, 11L)))
    // content-preserving: op=replace, free for incremental readers
    assert(TableFormat.changesBetween(spark, root, 2L, 3L).count() == 0L)
    // no manifests -> no-op, no commit
    val (s4, a, c) = TableFormat.materializeDeletes(spark, root, root)
    assert(s4.version == s3.version && a == 0 && c == 2)
  }

  test("concurrent append + MoR delete serialize: the delete masks the winner's rows") {
    val root = freshRoot()
    writeKv(Seq(1L -> 1.0, 2L -> 2.0), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)
    writeKv(Seq(3L -> 3.0, 7L -> 7.0), s"$root/w2")
    val appendFiles = TableFormat.listParquet(spark, s"$root/w2")
    // race an append of {3,7} against a MoR delete of {2,7} from v1: the
    // CAS loser re-derives against the winner, so whichever order they
    // land in, both commits exist and serialize
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val fa = pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = { start.await()
        TableFormat.appendFiles(spark, root, appendFiles).version }
    })
    val fd = pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = { start.await()
        TableFormat.deleteKeysMoR(spark, root, root, Seq(2L, 7L)).version }
    })
    start.countDown()
    val (va, vd) = (fa.get(30, TimeUnit.SECONDS), fd.get(30, TimeUnit.SECONDS))
    pool.shutdown()
    assert(Set(va, vd) == Set(2L, 3L))
    val content = TableFormat.read(spark, TableFormat.snapshot(spark, root))
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    if (vd > va)
      // delete committed AFTER the append: its manifest seq exceeds the
      // appended file's, so the appended k=7 is masked too — the
      // serializable delete-at-commit-time semantics
      assert(content == Seq(1L, 3L))
    else
      // append committed after: its rows are newer than the manifest
      assert(content == Seq(1L, 3L, 7L))
    // either order: both versions remain individually readable
    assert(TableFormat.read(spark, TableFormat.snapshot(spark, root, Some(1L)))
      .count() == 2L)
  }

  test("compactManifests merges only seq-indistinguishable manifests") {
    val root = freshRoot()
    writeKv(Seq(1L -> 1.0, 2L -> 2.0, 3L -> 3.0, 4L -> 4.0), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)     // v1, file seq 1
    TableFormat.deleteKeysMoR(spark, root, root, Seq(2L))      // manifest seq 2
    TableFormat.deleteKeysMoR(spark, root, root, Seq(3L))      // manifest seq 3
    writeKv(Seq(3L -> 33.0, 10L -> 10.0), s"$root/w2")
    TableFormat.appendFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/w2"))             // v4, file seq 4
    TableFormat.deleteKeysMoR(spark, root, root, Seq(10L))     // manifest seq 5
    def content() = TableFormat.read(spark, TableFormat.snapshot(spark, root))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val before = content()
    assert(before == Seq(1L -> 1.0, 3L -> 33.0, 4L -> 4.0))
    // seqs {2,3} merge (no file seq in [2,3)); seq 5 cannot join them
    // (file seq 4 separates: merging would mask the re-appended k=3)
    val (s6, nB, nA) = TableFormat.compactManifests(spark, root, root)
    assert(nB == 3 && nA == 2)
    assert(s6.deletes.map(_.seq) == Seq(3L, 5L))
    assert(s6.deletes.head.nKeys == 2L) // {2,3} unioned
    assert(content() == before)
    // the merged manifest still does NOT apply to the seq-4 re-append
    assert(content().contains(3L -> 33.0))
    // content-preserving: op=replace, free for incremental readers
    assert(TableFormat.changesBetween(spark, root, 5L, 6L).count() == 0L)
    // idempotent: nothing left to merge
    val (s7, b2, a2) = TableFormat.compactManifests(spark, root, root)
    assert(s7.version == s6.version && b2 == 2 && a2 == 2)
  }

  test("expireSnapshots never sweeps a live delete manifest") {
    val root = freshRoot()
    writeKv(Seq(1L -> 1.0, 2L -> 2.0), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)
    TableFormat.deleteKeysMoR(spark, root, root, Seq(2L))
    val (expired, removed) =
      TableFormat.expireSnapshots(spark, root, keepLast = 1, Seq(root),
        graceMs = 0L)
    assert(expired == Seq(1L))
    assert(!removed.exists(_.contains("mordel")),
      s"manifest swept: ${removed.mkString(",")}")
    // the surviving version still reads with the delete applied
    assert(TableFormat.read(spark, TableFormat.snapshot(spark, root))
      .orderBy("k").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("publishBranch refuses branch-born MoR manifests; inherited ones carry") {
    val root = freshRoot()
    writeKv(Seq(1L -> 1.0, 2L -> 2.0, 3L -> 3.0), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)
    TableFormat.deleteKeysMoR(spark, root, root, Seq(3L))  // main v2, inherited
    TableFormat.createBranch(spark, root, "wap")           // branch v3
    val broot = TableFormat.branchRoot(root, "wap")
    // inherited manifest masks k=3 on the branch too
    assert(TableFormat.read(spark, TableFormat.snapshot(spark, broot))
      .orderBy("k").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // a branch append is NEWER than the inherited manifest (no collision:
    // the branch log continues main's numbering)
    writeKv(Seq(3L -> 9.0), s"$broot/w2")
    TableFormat.appendFiles(spark, broot,
      TableFormat.listParquet(spark, s"$broot/w2"))
    assert(TableFormat.read(spark, TableFormat.snapshot(spark, broot))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq(1L -> 1.0, 2L -> 2.0, 3L -> 9.0))
    // a branch-born manifest cannot fast-forward (its ordering against the
    // branch's own files would collapse) — materialize first, then publish
    TableFormat.deleteKeysMoR(spark, broot, broot, Seq(1L))
    val e = intercept[IllegalArgumentException](
      TableFormat.publishBranch(spark, root, "wap"))
    assert(e.getMessage.contains("materialize"))
    TableFormat.compact(spark, broot, broot, 1)
    val pub = TableFormat.publishBranch(spark, root, "wap")
    assert(pub.deletes.isEmpty)
    assert(TableFormat.read(spark, TableFormat.snapshot(spark, root))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq(2L -> 2.0, 3L -> 9.0))
  }

  test("concurrent append + compactSmallFiles serialize; the binpack re-derives") {
    val root = freshRoot()
    def f(name: String, keys: Range): Seq[String] = {
      val p = writeKv(keys.map(i => (i.toLong, i * 1.0)), s"$root/$name")
      TableFormat.listParquet(spark, p)
    }
    TableFormat.commitFiles(spark, root, "k",
      f("f0", 0 until 5) ++ f("f1", 5 until 10) ++ f("f2", 10 until 15), 256, 3)
    val late = f("late", 100 until 105)
    val pool = Executors.newFixedThreadPool(2)
    try {
      val start = new CountDownLatch(1)
      val fa = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = { start.await()
          TableFormat.appendFiles(spark, root, late).version }
      })
      val fb = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = { start.await()
          TableFormat.compactSmallFiles(spark, root, root, targetRows = 12L)
            ._1.version }
      })
      start.countDown()
      val got = Set(fa.get(120, TimeUnit.SECONDS), fb.get(120, TimeUnit.SECONDS))
      assert(got == Set(2L, 3L), s"got $got")
      // whatever the order, nothing is lost and nothing duplicated
      val keys = TableFormat.read(spark, TableFormat.snapshot(spark, root))
        .orderBy("k").collect().map(_.getLong(0)).toSeq
      assert(keys == ((0L until 15L) ++ (100L until 105L)).toSeq)
    } finally pool.shutdownNow()
  }

  test("shallow clone: zero-copy bootstrap, independent divergence, MoR seq scoping") {
    import spark.implicits._
    val srcRoot = freshRoot(); val tgtRoot = freshRoot()
    writeKv((1L to 10L).map(i => (i, i * 1.0)), s"$srcRoot/w1")
    TableFormat.commitFiles(spark, srcRoot, "k",
      TableFormat.listParquet(spark, s"$srcRoot/w1"), 256, 3)      // src v1
    TableFormat.deleteKeysMoR(spark, srcRoot, srcRoot, Seq(4L))    // src v2
    val cloned = TableFormat.cloneTable(spark, srcRoot, tgtRoot)
    // zero-copy: same files AND the same manifest, by path, at v2
    assert(cloned.version == 2L && cloned.op.contains("clone"))
    assert(cloned.files.map(_.file) ==
      TableFormat.snapshot(spark, srcRoot).files.map(_.file))
    assert(cloned.deletes.map(_.file) ==
      TableFormat.snapshot(spark, srcRoot).deletes.map(_.file))
    def content(root: String) = TableFormat
      .read(spark, TableFormat.snapshot(spark, root))
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(content(tgtRoot) == content(srcRoot))
    // divergence: a MoR delete on the CLONE masks cloned files (the
    // continued numbering keeps its seq above theirs) and never touches
    // the source; a source append never appears on the clone
    TableFormat.deleteKeysMoR(spark, tgtRoot, tgtRoot, Seq(7L))    // tgt v3
    writeKv(Seq(20L -> 20.0), s"$srcRoot/w2")
    TableFormat.appendFiles(spark, srcRoot,
      TableFormat.listParquet(spark, s"$srcRoot/w2"))              // src v3
    assert(content(tgtRoot) ==
      (1L to 10L).filterNot(k => k == 4L || k == 7L))
    assert(content(srcRoot) == ((1L to 10L).filterNot(_ == 4L) :+ 20L))
    // a clone into a non-empty log refuses
    val e = intercept[IllegalArgumentException](
      TableFormat.cloneTable(spark, srcRoot, tgtRoot))
    assert(e.getMessage.contains("already has commits"))
    // constraints travel with the clone (props verbatim)
    val srcRoot2 = freshRoot(); val tgtRoot2 = freshRoot()
    writeKv(Seq(1L -> 1.0), s"$srcRoot2/w")
    TableFormat.commitFiles(spark, srcRoot2, "k",
      TableFormat.listParquet(spark, s"$srcRoot2/w"), 256, 3)
    TableFormat.setConstraint(spark, srcRoot2, "pos_v", "v > 0")
    TableFormat.cloneTable(spark, srcRoot2, tgtRoot2)
    val e2 = intercept[IllegalArgumentException](TableFormat.upsertRowsMoR(
      spark, tgtRoot2, tgtRoot2, Seq(2L -> -1.0).toDF("k", "v")))
    assert(e2.getMessage.contains("pos_v"))
  }

  test("tags: named pins resolve, survive maintenance, protect retention") {
    val root = freshRoot()
    writeKv(Seq(1L -> 1.0, 2L -> 2.0), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)       // v1
    TableFormat.createTag(spark, root, "audited")                // v2 @ v1? no: pins current head = v1
    writeKv(Seq(3L -> 3.0), s"$root/w2")
    TableFormat.appendFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/w2"))               // v3
    TableFormat.compact(spark, root, root, 1)                    // v4
    // the tag still resolves to the pinned content after maintenance
    val tagged = TableFormat.snapshotOfTag(spark, root, "audited")
    assert(tagged.version == 1L)
    assert(TableFormat.read(spark, tagged).count() == 2L)
    // all-digit names are refused (they would shadow numeric pins)
    val e0 = intercept[IllegalArgumentException](
      TableFormat.createTag(spark, root, "7"))
    assert(e0.getMessage.contains("non-numeric"))
    // retention: keepLast=1 would expire v1, but the tag protects it —
    // its version AND its data files survive the sweep
    val (expired, removed) = TableFormat.expireSnapshots(spark, root,
      keepLast = 1, Seq(root), graceMs = 0L)
    assert(!expired.contains(1L))
    assert(TableFormat.read(spark,
      TableFormat.snapshotOfTag(spark, root, "audited")).count() == 2L)
    // dropping the tag re-opens the horizon
    TableFormat.dropTag(spark, root, "audited")                  // v5
    val (expired2, _) = TableFormat.expireSnapshots(spark, root,
      keepLast = 1, Seq(root), graceMs = 0L)
    assert(expired2.contains(1L))
    val e1 = intercept[IllegalArgumentException](
      TableFormat.snapshotOfTag(spark, root, "audited"))
    assert(e1.getMessage.contains("no tag"))
  }

  test("approxDistinctKeys: merged file sketches equal the single-pass sketch; refusals") {
    import spark.implicits._
    val root = freshRoot()
    // three OVERLAPPING files: per-file distinct counts sum to 1800 but
    // the true global distinct is 1000 — the merge has to matter
    writeKv((0L until 600L).map(i => (i, 1.0)), s"$root/f0")
    writeKv((400L until 1000L).map(i => (i, 1.0)), s"$root/f1")
    writeKv((0L until 1000L by 5).map(i => (i, 1.0)), s"$root/f2")
    val s1 = TableFormat.commitFiles(spark, root, "k",
      Seq("f0", "f1", "f2").flatMap(n => TableFormat.listParquet(spark, s"$root/$n")),
      256, 3)
    val est = TableFormat.approxDistinctKeys(s1)
    // bit-identical to one pass over the union (exact mergeability)
    val direct = TableFormat.read(spark, s1)
      .agg(graft.Functions.kmv_distinct(col("k").cast("string"),
        TableFormat.KmvStatsK)).collect()(0).getDouble(0)
    assert(est == direct, s"merged=$est single-pass=$direct")
    assert(math.abs(est - 1000.0) / 1000.0 < 0.3, s"est=$est")
    // below k distinct: exact
    val small = freshRoot()
    writeKv((1L to 20L).map(i => (i, 1.0)), s"$small/f")
    val s2 = TableFormat.commitFiles(spark, small, "k",
      TableFormat.listParquet(spark, s"$small/f"), 256, 3)
    assert(TableFormat.approxDistinctKeys(s2) == 20.0)
    // pending MoR manifests refuse (masked keys would inflate)
    TableFormat.deleteKeysMoR(spark, small, small, Seq(5L))
    val e = intercept[IllegalArgumentException](
      TableFormat.approxDistinctKeys(TableFormat.snapshot(spark, small)))
    assert(e.getMessage.contains("materialize"))
    // materialization restores the metadata answer
    TableFormat.compact(spark, small, small, 1)
    assert(TableFormat.approxDistinctKeys(
      TableFormat.snapshot(spark, small)) == 19.0)
  }

  test("CHECK constraints: declaration validates, row-adding commits refuse violations") {
    import spark.implicits._
    val root = freshRoot()
    writeKv((1L to 10L).map(i => (i, i * 1.0)), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)         // v1
    // a declaration the existing data violates refuses up front
    val e0 = intercept[IllegalArgumentException](
      TableFormat.setConstraint(spark, root, "high_keys", "k > 5"))
    assert(e0.getMessage.contains("existing rows"))
    val s2 = TableFormat.setConstraint(spark, root, "pos_v", "v > 0") // v2
    assert(s2.op.contains("replace"))
    assert(TableFormat.changesBetween(spark, root, 1L, 2L).count() == 0L)
    // valid append lands; violating append refuses and leaves NO version
    writeKv(Seq(11L -> 1.0), s"$root/ok")
    TableFormat.appendFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/ok"))                 // v3
    writeKv(Seq(12L -> -1.0), s"$root/bad")
    val e1 = intercept[IllegalArgumentException](TableFormat.appendFiles(
      spark, root, TableFormat.listParquet(spark, s"$root/bad")))
    assert(e1.getMessage.contains("pos_v"))
    val e2 = intercept[IllegalArgumentException](TableFormat.upsertRowsMoR(
      spark, root, root, Seq(1L -> -5.0).toDF("k", "v")))
    assert(e2.getMessage.contains("pos_v"))
    val e3 = intercept[IllegalArgumentException](TableFormat.mergeRows(
      spark, root, root, Seq(1L -> -5.0).toDF("k", "v")))
    assert(e3.getMessage.contains("pos_v"))
    assert(TableFormat.versions(spark, root) == Seq(1L, 2L, 3L))
    assert(TableFormat.read(spark, TableFormat.snapshot(spark, root))
      .count() == 11L)
    // maintenance carries the constraint forward; dropping re-opens the gate
    TableFormat.compact(spark, root, root, 1)                      // v4
    val e4 = intercept[IllegalArgumentException](TableFormat.appendFiles(
      spark, root, TableFormat.listParquet(spark, s"$root/bad")))
    assert(e4.getMessage.contains("pos_v"))
    TableFormat.dropConstraint(spark, root, "pos_v")               // v5
    TableFormat.appendFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/bad"))                // v6
    assert(TableFormat.read(spark, TableFormat.snapshot(spark, root))
      .count() == 12L)
  }

  test("rewriteClustered: one file per group, zone decls flow, masks materialize") {
    import spark.implicits._
    val root = freshRoot()
    def writeKvz(keys: Range, path: String): Seq[String] = {
      keys.map(i => (i.toLong, i * 1.0, (i % 10).toLong)).toDF("k", "v", "z")
        .repartition(1).write.mode("overwrite").parquet(path)
      TableFormat.listParquet(spark, path)
    }
    TableFormat.commitFiles(spark, root, "k",
      writeKvz(0 until 100, s"$root/f0") ++ writeKvz(100 until 200, s"$root/f1"),
      1024, 3, zoneCols = Seq("z"))                            // v1
    TableFormat.deleteKeysMoR(spark, root, root, Seq(5L))      // v2
    // regroup by z-halves: the rewrite shuffles ONCE, lands one file per
    // group, clears the manifest (masks materialized), declares z zones
    val s3 = TableFormat.rewriteClustered(spark, root, root,
      (col("z") / 5).cast("int"), zoneCols = Seq("z"))
    assert(s3.op.contains("replace") && s3.deletes.isEmpty)
    assert(s3.files.size == 2)
    assert(s3.files.map(_.zones("z")).sortBy(_._1) == Seq((0L, 4L), (5L, 9L)))
    assert(TableFormat.read(spark, s3).count() == 199L) // k=5 stays deleted
    // the new clustering prunes: a z probe reads one file
    val (zscan, nRead, nTotal) = TableFormat.scanZone(spark, s3, "z", 0L, 4L)
    assert(nRead == 1 && nTotal == 2)
    assert(zscan.count() == 100L) // the masked k=5 (z=5) is in the OTHER group
    assert(TableFormat.scanZone(spark, s3, "z", 5L, 9L)._1.count() == 99L)
    // pinned v1 reader keeps the old layout and full content
    assert(TableFormat.read(spark,
      TableFormat.snapshot(spark, root, Some(1L))).count() == 200L)
    // changelog-free
    assert(TableFormat.changesBetween(spark, root, 2L, 3L).count() == 0L)
  }

  test("compactSmallFiles: key-adjacent greedy bins, singletons and large files carry") {
    val root = freshRoot()
    def f(name: String, keys: Range): Seq[String] = {
      val p = writeKv(keys.map(i => (i.toLong, i * 1.0)), s"$root/$name")
      TableFormat.listParquet(spark, p)
    }
    val files = f("f0", 0 until 10) ++ f("f1", 10 until 15) ++
      f("f2", 15 until 20) ++ f("f3", 20 until 30) ++ f("f4", 30 until 32) ++
      f("f5", 40 until 50) ++ f("big", 100 until 200)
    val s1 = TableFormat.commitFiles(spark, root, "k", files, 1024, 3)
    assert(s1.files.size == 7)
    // target 21: bins over the small tail in minKey order are
    // {f0,f1,f2}=20, {f3,f4}=12 (f5 would overflow), {f5} singleton;
    // big (100 rows) is never a candidate
    val (s2, nPacked, nBins) =
      TableFormat.compactSmallFiles(spark, root, root, targetRows = 21L)
    assert((nPacked, nBins) == ((5, 2)))
    assert(s2.files.size == 4 && s2.op.contains("replace"))
    // carried by reference: big and the singleton keep their v1 seqs
    assert(s2.files.count(_.seq == 1L) == 2)
    // adjacency preserved: the two rewritten bins cover disjoint,
    // contiguous key ranges — zone pruning power survives
    val rewr = s2.files.filter(_.seq == 2L).sortBy(_.minKey)
    assert(rewr.map(f => (f.minKey, f.maxKey)) == Seq((0L, 19L), (20L, 31L)))
    // content identical; changelog-free (op=replace)
    assert(TableFormat.read(spark, s2).orderBy("k").collect().map(_.getLong(0))
      .toSeq == ((0 until 32) ++ (40 until 50) ++ (100 until 200)).map(_.toLong))
    assert(TableFormat.changesBetween(spark, root, 1L, 2L).count() == 0L)
  }

  test("compactSmallFiles under MoR: bins materialize masks, carried files keep theirs") {
    val root = freshRoot()
    def f(name: String, keys: Range): Seq[String] = {
      val p = writeKv(keys.map(i => (i.toLong, i * 1.0)), s"$root/$name")
      TableFormat.listParquet(spark, p)
    }
    TableFormat.commitFiles(spark, root, "k",
      f("f0", 1 to 10) ++ f("f1", 11 to 20) ++ f("big", 100 until 200),
      256, 3)                                                   // v1
    TableFormat.deleteKeysMoR(spark, root, root, Seq(5L, 15L, 150L)) // v2
    val (s3, nPacked, nBins) =
      TableFormat.compactSmallFiles(spark, root, root, targetRows = 25L)
    assert((nPacked, nBins) == ((2, 1)))
    // the manifest is CARRIED (big still needs it), and the rewritten
    // bin is materialized — 5/15 gone from it, 150 still masked on big
    assert(s3.deletes.size == 1)
    val keys = TableFormat.read(spark, s3).orderBy("k").collect()
      .map(_.getLong(0)).toSeq
    assert(keys == ((1L to 20L).filterNot(k => k == 5L || k == 15L) ++
      (100L until 200L).filterNot(_ == 150L)))
    // the rewritten bin really is one file at the new seq
    assert(s3.files.count(_.seq == 3L) == 1 && s3.files.size == 2)
  }

  test("deleteWhere: covered files drop metadata-only, boundary rewrites, disjoint carry") {
    val root = freshRoot()
    val files = Seq(0, 1, 2, 3).flatMap { b =>
      val f = writeKv((0L until 100L).map(i => (b * 1000L + i, i * 1.0)), s"$root/f$b")
      TableFormat.listParquet(spark, f)
    }
    val s1 = TableFormat.commitFiles(spark, root, "k", files, 1024, 3)
    // [1000, 2049]: f1 fully covered -> drop; f2 boundary -> rewrite;
    // f0/f3 disjoint -> carry
    val (s2, nDrop, nRewr, nCarry) =
      TableFormat.deleteWhere(spark, root, root, "k", 1000L, 2049L)
    assert((nDrop, nRewr, nCarry) == ((1, 1, 2)))
    val keys = TableFormat.read(spark, s2).orderBy("k").collect()
      .map(_.getLong(0)).toSeq
    assert(keys == ((0L until 100L) ++ (2050L until 2100L) ++
      (3000L until 3100L)).toSeq)
    // carried files are BY REFERENCE: same file at its original seq, and
    // the dropped/boundary originals left the list
    val v1Names = s1.files.map(_.file).toSet
    assert(s2.files.count(f => v1Names(f.file) && f.seq == 1L) == 2)
    assert(s2.files.size == 3 && s2.op.contains("delete"))
    // v1 pinned reader unaffected (snapshot isolation)
    assert(TableFormat.read(spark, TableFormat.snapshot(spark, root, Some(1L)))
      .count() == 400L)
    // changelog: exactly the deleted rows, as deletes
    val delta = TableFormat.changesBetween(spark, root, 1L, 2L)
    assert(delta.filter(col("_change") === "insert").count() == 0L)
    assert(delta.filter(col("_change") === "delete").count() == 150L)
  }

  test("deleteWhere on a secondary zone column; missing bounds rewrite conservatively") {
    import spark.implicits._
    val root = freshRoot()
    def writeZoned(b: Long, path: String): Seq[String] = {
      (0L until 50L).map(i => (b * 100L + i, 1.0, b * 10L + i % 10))
        .toDF("k", "v", "z").repartition(1)
        .write.mode("overwrite").parquet(path)
      TableFormat.listParquet(spark, path)
    }
    val files = Seq(0L, 1L, 2L).flatMap(b => writeZoned(b, s"$root/f$b"))
    TableFormat.commitFiles(spark, root, "k", files, 256, 3, zoneCols = Seq("z"))
    // z ranges: f0 [0,9], f1 [10,19], f2 [20,29]; delete z in [10,25]:
    // f1 covered -> drop, f2 boundary -> rewrite, f0 carried
    val (s2, nDrop, nRewr, nCarry) =
      TableFormat.deleteWhere(spark, root, root, "z", 10L, 25L)
    assert((nDrop, nRewr, nCarry) == ((1, 1, 1)))
    val zs = TableFormat.read(spark, s2).select("z").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(zs == ((0L to 9L) ++ (26L to 29L)).toSeq)
    // a non-key, non-zone column refuses rather than guessing
    val e = intercept[IllegalArgumentException](
      TableFormat.deleteWhere(spark, root, root, "v", 0L, 1L))
    assert(e.getMessage.contains("neither the key"))
  }

  test("deleteWhere boundary rewrites materialize MoR masks (no resurrection)") {
    val root = freshRoot()
    writeKv((1L to 10L).map(i => (i, i * 1.0)), s"$root/fa")
    writeKv((11L to 20L).map(i => (i, i * 1.0)), s"$root/fb")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/fa") ++
        TableFormat.listParquet(spark, s"$root/fb"), 256, 3)   // v1
    TableFormat.deleteKeysMoR(spark, root, root, Seq(5L, 15L)) // v2
    // [8,12] overlaps BOTH files -> both rewrite; the replacement files
    // take the commit's seq, so the v2 manifest no longer applies to
    // them — the rewrite read masks through, k=5/k=15 stay deleted
    val (s3, nDrop, nRewr, nCarry) =
      TableFormat.deleteWhere(spark, root, root, "k", 8L, 12L)
    assert((nDrop, nRewr, nCarry) == ((0, 2, 0)))
    val keys = TableFormat.read(spark, s3).orderBy("k").collect()
      .map(_.getLong(0)).toSeq
    assert(keys == Seq(1L, 2L, 3L, 4L, 6L, 7L, 13L, 14L, 16L, 17L, 18L, 19L, 20L))
  }

  test("replicateTo: bootstrap, netted multi-commit advance, cursor bump, idempotent") {
    import spark.implicits._
    val srcRoot = freshRoot(); val tgtRoot = freshRoot()
    writeKv((0L until 40L).map(i => (i, i * 1.0)), s"$srcRoot/fa")
    TableFormat.commitFiles(spark, srcRoot, "k",
      TableFormat.listParquet(spark, s"$srcRoot/fa"), 1024, 3)       // src v1
    def srcContent() = TableFormat.read(spark, TableFormat.snapshot(spark, srcRoot))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def tgtContent(v: Option[Long] = None) = TableFormat
      .read(spark, TableFormat.snapshot(spark, tgtRoot, v))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // tick 1: bootstrap = full copy, cursor pinned in props
    val m1 = TableFormat.replicateTo(spark, srcRoot, tgtRoot, tgtRoot)
    assert(m1.version == 1L && m1.props("source_version") == "1")
    assert(tgtContent() == srcContent())
    // src v2 upsert + v3 delete; ONE tick nets both into ONE mirror commit
    TableFormat.upsertRowsMoR(spark, srcRoot, srcRoot,
      Seq(5L -> 105.0, 6L -> 106.0).toDF("k", "v"))                  // src v2
    TableFormat.deleteKeysMoR(spark, srcRoot, srcRoot, Seq(10L, 11L, 12L)) // v3
    val m2 = TableFormat.replicateTo(spark, srcRoot, tgtRoot, tgtRoot)
    assert(m2.version == 2L && m2.op.contains("mor-upsert") &&
      m2.props("source_version") == "3")
    assert(tgtContent() == srcContent())
    // O(changes) shape: every bootstrap file carried by reference, exactly
    // one new batch file, one manifest masking the 5 touched keys
    assert(m1.files.map(_.file).forall(m2.files.map(_.file).contains))
    assert(m2.files.size == m1.files.size + 1)
    assert(m2.deletes.size == 1 && m2.deletes.head.nKeys == 5L)
    // src v4 materialization: content-preserving -> tick 3 is a pure
    // metadata cursor bump (no file churn on the mirror)
    TableFormat.materializeDeletes(spark, srcRoot, srcRoot)          // src v4
    val m3 = TableFormat.replicateTo(spark, srcRoot, tgtRoot, tgtRoot)
    assert(m3.version == 3L && m3.op.contains("replace") &&
      m3.props("source_version") == "4")
    assert(m3.files.map(_.file).sorted == m2.files.map(_.file).sorted)
    assert(tgtContent() == srcContent())
    // tick 4: cursor == head -> NO commit (at-least-once caller, exactly-once)
    val m4 = TableFormat.replicateTo(spark, srcRoot, tgtRoot, tgtRoot)
    assert(m4.version == 3L)
    assert(TableFormat.versions(spark, tgtRoot) == Seq(1L, 2L, 3L))
    // the mirror keeps full table semantics: time travel to its v1 shows
    // the pre-advance state, and its own changelog emits the netted delta
    assert(tgtContent(Some(1L)).toMap.get(5L).contains(5.0))
    val mirrorDelta = TableFormat.changesBetween(spark, tgtRoot, 1L, 2L)
    assert(mirrorDelta.select("k").distinct().collect().map(_.getLong(0)).sorted
      .toSeq == Seq(5L, 6L, 10L, 11L, 12L))
  }

  test("replicateTo nets delete-then-reappend and follows schema evolution") {
    import spark.implicits._
    val srcRoot = freshRoot(); val tgtRoot = freshRoot()
    writeKv(Seq(1L -> 1.0, 2L -> 2.0, 3L -> 3.0), s"$srcRoot/fa")
    TableFormat.commitFiles(spark, srcRoot, "k",
      TableFormat.listParquet(spark, s"$srcRoot/fa"), 256, 3)        // src v1
    TableFormat.replicateTo(spark, srcRoot, tgtRoot, tgtRoot)        // mirror v1
    // src v2: MoR-delete k=2; src v3: widened re-append of k=2
    TableFormat.deleteKeysMoR(spark, srcRoot, srcRoot, Seq(2L))      // src v2
    Seq((2L, 22.0, "tag")).toDF("k", "v", "t").repartition(1)
      .write.mode("overwrite").parquet(s"$srcRoot/fb")
    TableFormat.appendFiles(spark, srcRoot,
      TableFormat.listParquet(spark, s"$srcRoot/fb"))                // src v3
    val m2 = TableFormat.replicateTo(spark, srcRoot, tgtRoot, tgtRoot)
    // the window nets k=2 to its LATEST state (the widened re-append);
    // the mirror's schema widened without rewriting its v1 file
    assert(m2.version == 2L)
    val got = TableFormat.read(spark, m2).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSeq
    assert(got == Seq((1L, 1.0, None), (2L, 22.0, Some("tag")), (3L, 3.0, None)))
    assert(m2.files.count(f => m2.version == f.seq) == 1) // one new batch file
  }

  test("commit JSON escapes control characters: multi-line constraint SQL round-trips") {
    import spark.implicits._
    val root = freshRoot()
    writeKv((1L to 5L).map(k => k -> k.toDouble), s"$root/fa")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/fa"), 256, 3)
    // a newline+tab in the predicate (multi-line SQL) and in a prop value:
    // pre-fix this published a commit that every later parse rejected
    val pred = "v > 0\n\tAND v < 100"
    TableFormat.setConstraint(spark, root, "ml", pred)
    val snap = TableFormat.snapshot(spark, root) // parse must survive
    assert(snap.props("constraint.ml") == pred)
    // the multi-line predicate ENFORCES: a violating append is refused
    Seq((9L, -1.0)).toDF("k", "v").repartition(1)
      .write.mode("overwrite").parquet(s"$root/bad")
    val e = intercept[IllegalArgumentException](TableFormat.appendFiles(
      spark, root, TableFormat.listParquet(spark, s"$root/bad")))
    assert(e.getMessage.contains("ml"))
  }

  test("setConstraint racing a violating append: no violating row ever lands after the constraint commit") {
    import spark.implicits._
    // run the race a few times so both win orders occur; the invariant
    // holds in either: if the append commits AFTER the constraint, the
    // in-derive re-check must have refused it
    (1 to 4).foreach { i =>
      val root = freshRoot()
      writeKv((1L to 5L).map(k => k -> k.toDouble), s"$root/fa")
      TableFormat.commitFiles(spark, root, "k",
        TableFormat.listParquet(spark, s"$root/fa"), 256, 3)
      Seq((100L + i, -5.0)).toDF("k", "v").repartition(1)
        .write.mode("overwrite").parquet(s"$root/bad")
      val badFiles = TableFormat.listParquet(spark, s"$root/bad")
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(2)
      val fCons = pool.submit(new java.util.concurrent.Callable[Option[Long]] {
        def call(): Option[Long] = {
          start.await()
          try Some(TableFormat.setConstraint(spark, root, "pos_v", "v > 0").version)
          catch { case _: IllegalArgumentException => None } // append won + landed first
        }
      })
      val fApp = pool.submit(new java.util.concurrent.Callable[Option[Long]] {
        def call(): Option[Long] = {
          start.await()
          try Some(TableFormat.appendFiles(spark, root, badFiles).version)
          catch { case _: IllegalArgumentException => None } // refused by re-check
        }
      })
      start.countDown()
      val consV = fCons.get(120, TimeUnit.SECONDS)
      val appV = fApp.get(120, TimeUnit.SECONDS)
      pool.shutdown()
      (consV, appV) match {
        case (Some(cv), Some(av)) =>
          // both landed: only legal when the append committed FIRST
          assert(av < cv, s"violating append v$av landed after constraint v$cv")
        case (Some(_), None) => // append refused by the in-derive re-check
        case (None, Some(_)) => // constraint refused: the violating row was live
        case (None, None) =>
          fail("both the constraint and the append were refused")
      }
      // terminal invariant: constraint present => no violating row visible
      val head = TableFormat.snapshot(spark, root)
      if (head.props.contains("constraint.pos_v"))
        assert(TableFormat.read(spark, head).filter(col("v") <= 0).count() == 0L)
    }
  }

  test("conflict matrix: scoped validation fails loud only on overlapping row-changing commits") {
    import spark.implicits._
    val root = freshRoot()
    writeKv((1L to 50L).map(k => k -> k.toDouble), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)       // v1
    val v1 = TableFormat.snapshot(spark, root)
    writeKv((100L to 200L by 10).map(k => k -> k.toDouble), s"$root/w2")
    TableFormat.appendFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/w2"))               // v2 append [100,200]
    val v2 = TableFormat.snapshot(spark, root)
    def ok(base: TableFormat.Snapshot, cur: TableFormat.Snapshot,
           lo: Long, hi: Long, apps: Boolean = true) =
      TableFormat.assertNoConflicts(spark, root, base, cur, "k", lo, hi,
        "spec", conflictWithAppends = apps)
    def bad(base: TableFormat.Snapshot, cur: TableFormat.Snapshot,
            lo: Long, hi: Long, apps: Boolean = true) =
      intercept[TableFormat.CommitConflictException](
        TableFormat.assertNoConflicts(spark, root, base, cur, "k", lo, hi,
          "spec", conflictWithAppends = apps))
    ok(v1, v2, 1L, 50L)                 // disjoint append: both land
    bad(v1, v2, 150L, 160L)             // in-scope append invalidates RMW
    ok(v1, v2, 150L, 160L, apps = false) // ...unless delete-at-commit-time
    TableFormat.deleteKeysMoR(spark, root, root, Seq(10L, 20L))  // v3
    val v3 = TableFormat.snapshot(spark, root)
    bad(v2, v3, 5L, 15L)                // overlapping delete manifest
    bad(v2, v3, 5L, 15L, apps = false)  // appends-exempt still sees deletes
    ok(v2, v3, 30L, 60L)                // disjoint delete
    TableFormat.compact(spark, root, root, 1)                    // v4 replace
    val v4 = TableFormat.snapshot(spark, root)
    ok(v3, v4, 1L, 200L)                // content-preserving: never conflicts
    TableFormat.overwriteFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/w2"))               // v5 overwrite
    val v5 = TableFormat.snapshot(spark, root)
    bad(v4, v5, 1L, 5L)                 // replacement conflicts with any scope
  }

  test("overlapping upsert race: the CAS loser fails with a named conflict (or serializes cleanly)") {
    import spark.implicits._
    (1 to 4).foreach { i =>
      val root = freshRoot()
      writeKv((1L to 20L).map(k => k -> 1.0), s"$root/w1")
      TableFormat.commitFiles(spark, root, "k",
        TableFormat.listParquet(spark, s"$root/w1"), 256, 3)
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(2)
      def upsert(value: Double) = new java.util.concurrent.Callable[Either[String, Long]] {
        def call(): Either[String, Long] = {
          start.await()
          try Right(TableFormat.upsertRowsMoR(spark, root, root,
            Seq(5L -> value).toDF("k", "v")).version)
          catch { case e: TableFormat.CommitConflictException =>
            Left(e.getMessage) }
        }
      }
      val fa = pool.submit(upsert(100.0)); val fb = pool.submit(upsert(200.0))
      start.countDown()
      val (ra, rb) = (fa.get(120, TimeUnit.SECONDS), fb.get(120, TimeUnit.SECONDS))
      pool.shutdown()
      val vGot = TableFormat.read(spark, TableFormat.snapshot(spark, root))
        .filter(col("k") === 5L).collect().map(_.getDouble(1)).toSeq
      (ra, rb) match {
        case (Right(va), Right(vb)) =>
          // no CAS loss: they serialized cleanly — k=5 holds the LATER value
          assert(va != vb)
          val later = if (va > vb) 100.0 else 200.0
          assert(vGot == Seq(later), s"expected $later, got $vGot")
        case (Left(msg), Right(_)) =>
          assert(msg.contains("upsertRowsMoR") && msg.contains("conflicts"))
          assert(vGot == Seq(200.0))
        case (Right(_), Left(msg)) =>
          assert(msg.contains("upsertRowsMoR") && msg.contains("conflicts"))
          assert(vGot == Seq(100.0))
        case (Left(_), Left(_)) => fail("both upserts failed")
      }
    }
  }

  test("partition spec: routed writes prune via zones, evolution applies to new files only") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = freshRoot()
    // month-of-date spec v1, then evolve to width-100 key buckets
    val base = spark.range(1, 201).select(col("id").as("k"),
      expr("date_add(DATE'2024-01-01', CAST(id / 20 AS INT) * 31)").as("d"),
      (col("id") * 2).as("v"))
    base.filter(col("k") <= 100).limit(0).repartition(1)
      .write.mode("overwrite").parquet(s"$root/seed")
    // bootstrap with an empty seed so the spec can be declared up front
    TableFormat.createEmpty(spark, root, "k",
      "k BIGINT, d DATE, v BIGINT", zoneCols = Seq("d"))
    TableFormat.setPartitionSpec(spark, root, "month(d)")          // v2
    TableFormat.appendPartitioned(spark, root,
      base.filter(col("k") <= 100), root)                          // v3
    val s3 = TableFormat.snapshot(spark, root)
    // one file per live month, each with TIGHT d-bounds
    val months = base.filter(col("k") <= 100)
      .select(date_format(col("d"), "yyyy-MM")).distinct().count()
    assert(s3.files.size == months.toInt, s"${s3.files.size} vs $months")
    // the routing column must NOT leak into the stored schema or reads
    assert(!spark.read.parquet(s3.files.head.file).columns.contains("_pv"))
    assert(TableFormat.read(spark, s3).columns.toSeq == Seq("k", "d", "v"))
    assert(TableFormat.read(spark, s3).count() == 100L)
    // EVOLVE: new spec routes new files; old files stay put
    TableFormat.setPartitionSpec(spark, root, "div(k, 25)")        // v4
    TableFormat.appendPartitioned(spark, root,
      base.filter(col("k") > 100), root)                           // v5
    val s5 = TableFormat.snapshot(spark, root)
    val buckets = base.filter(col("k") > 100)
      .select(floor(col("k") / 25)).distinct().count()
    assert(s5.files.size == months.toInt + buckets.toInt)
    assert(TableFormat.read(spark, s5).count() == 200L)
    // a date probe inside ONE month prunes every other month file AND
    // uses the gen-2 files' real d-bounds (both specs prune correctly)
    val d0 = java.sql.Date.valueOf("2024-03-03")
    val lo = d0.toLocalDate.toEpochDay; val (scan, nRead, nTotal) =
      TableFormat.scanZone(spark, s5, "d", lo, lo)
    assert(nTotal == months.toInt + buckets.toInt)
    val expect = base.filter(col("d") === lit(d0)).count()
    assert(scan.count() == expect && expect > 0)
    // gen-1: exactly one month file holds that date; gen-2 files whose
    // d-zones cover it are read too — the prune count is their sum
    val s5hit = s5.files.count(f =>
      f.zones("d")._1 <= lo && f.zones("d")._2 >= lo)
    assert(nRead == s5hit && nRead < nTotal)
    // a key probe prunes to exactly ONE width-25 gen-2 bucket (gen-1
    // files all hold k <= 100, so their key bounds skip too)
    val (kscan, kRead, _) = TableFormat.scanRange(spark, s5, 130L, 140L)
    assert(kscan.count() == 11L)
    assert(kRead == 1, s"kRead=$kRead")
    // un-zoned spec column refused loudly
    val e = intercept[IllegalArgumentException](
      TableFormat.setPartitionSpec(spark, root, "v"))
    assert(e.getMessage.contains("zone"))
    // spec survives maintenance commits (props carry forward)
    TableFormat.compact(spark, root, root, 2)
    assert(TableFormat.snapshot(spark, root)
      .props(TableFormat.PartitionSpecProp) == "div(k, 25)")
  }

  test("replaceDataFiles: a concurrently swapped group fails loud; disjoint swaps compose") {
    import spark.implicits._
    val root = freshRoot()
    val fa = writeKv((1L to 20L).map(k => k -> 1.0), s"$root/fa")
    val fb = writeKv((100L to 120L).map(k => k -> 2.0), s"$root/fb")
    TableFormat.commitFiles(spark, root,
      "k", TableFormat.listParquet(spark, fa) ++ TableFormat.listParquet(spark, fb),
      256, 3)
    val base = TableFormat.snapshot(spark, root)
    val lowFile = base.files.minBy(_.minKey)
    val highFile = base.files.maxBy(_.minKey)
    def rewrite(tag: String, keys: Seq[Long]): (Seq[TableFormat.FileStat], String) = {
      val out = writeKv(keys.map(k => k -> 9.0), s"$root/$tag")
      val fs = TableFormat.listParquet(spark, out)
      (TableFormat.fileStats(spark, fs, "k", 256, 3), out)
    }
    // swap the low group (commits v2)
    val (s1, _) = rewrite("r1", 1L to 20L)
    TableFormat.replaceDataFiles(spark, root, base, Set(lowFile.file), s1,
      Some(spark.read.parquet(s1.map(_.file): _*)), "update")
    // a second rewrite computed from the SAME base against the SAME
    // (now-gone) group: stale — must fail with a named conflict
    val (s2, _) = rewrite("r2", 1L to 20L)
    val e = intercept[TableFormat.CommitConflictException](
      TableFormat.replaceDataFiles(spark, root, base, Set(lowFile.file), s2,
        Some(spark.read.parquet(s2.map(_.file): _*)), "update"))
    assert(e.getMessage.contains("concurrent"), e.getMessage)
    // ...but a stale-base swap of the UNTOUCHED group composes fine
    val (s3, _) = rewrite("r3", 100L to 120L)
    val after = TableFormat.replaceDataFiles(spark, root, base,
      Set(highFile.file), s3,
      Some(spark.read.parquet(s3.map(_.file): _*)), "update")
    assert(after.version == 3L)
    assert(TableFormat.read(spark, after)
      .filter(col("v") === 9.0).count() == 41L)
  }

  test("appendWithQuarantine: clean rows land, violators quarantine with named reasons") {
    import spark.implicits._
    val root = freshRoot(); val qroot = freshRoot()
    writeKv(Seq(1L -> 1.0), s"$root/fa")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/fa"), 256, 3)
    TableFormat.setConstraint(spark, root, "pos_v", "v > 0")
    TableFormat.setConstraint(spark, root, "small_k", "k < 1000")
    val batch = Seq(
      (2L, 2.0),      // clean
      (3L, -3.0),     // pos_v
      (2000L, 4.0),   // small_k
      (3000L, -5.0))  // both
      .toDF("k", "v")
    val (m, q, nClean, nQuar) = TableFormat.appendWithQuarantine(
      spark, root, qroot, batch, root)
    assert(nClean == 1L && nQuar == 3L)
    assert(TableFormat.read(spark, m).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val qRows = TableFormat.read(spark, q.get)
      .select("k", "_violated").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(qRows == Seq((3L, "pos_v"), (2000L, "small_k"),
      (3000L, "pos_v,small_k")))
    // the quarantine table carries NO constraints: replaying a fixed
    // row back into the main table works, re-quarantining does not loop
    val (m2, q2, c2, n2) = TableFormat.appendWithQuarantine(
      spark, root, qroot, Seq(3L -> 3.0).toDF("k", "v"), root)
    assert(c2 == 1L && n2 == 0L && q2.isEmpty)
    assert(TableFormat.read(spark, m2).count() == 3L)
    // an all-clean batch leaves the quarantine log untouched
    assert(TableFormat.versions(spark, qroot) == Seq(1L))
  }

  test("expireSnapshots never sweeps a live branch's staged data (the _branch subtree is out of scope)") {
    import spark.implicits._
    val root = freshRoot()
    def writeRows(rows: Seq[(Long, Double)], path: String): Seq[String] = {
      rows.toDF("k", "v").repartition(1).write.mode("overwrite").parquet(path)
      TableFormat.listParquet(spark, path)
    }
    TableFormat.commitFiles(spark, root, "k",
      writeRows(Seq(1L -> 1.0, 2L -> 2.0), s"$root/fa"), 256, 3)
    TableFormat.appendFiles(spark, root,
      writeRows(Seq(3L -> 3.0), s"$root/fb"))
    // stage work on a branch: its appended file lives under the main
    // root's _branch subtree and is referenced ONLY by the branch log
    TableFormat.createBranch(spark, root, "wip")
    val broot = TableFormat.branchRoot(root, "wip")
    TableFormat.appendFiles(spark, broot,
      writeRows(Seq(100L -> 100.0), s"$broot/staged"))
    // an aggressive main-root sweep (keep 1, zero grace) must not
    // destroy the staged branch file
    TableFormat.expireSnapshots(spark, root, keepLast = 1,
      Seq(root), graceMs = 0L)
    val staged = TableFormat.read(spark, TableFormat.snapshot(spark, broot))
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(staged == Seq(1L, 2L, 3L, 100L))
    // and the branch still publishes cleanly... after main's horizon
    // moved the fork check fails loud (main advanced is a separate
    // contract) — content readability is what this test pins
  }

  test("deleteWhere never deletes null rows: null-gated whole-file drops, null-keeping boundary rewrite") {
    import spark.implicits._
    val root = freshRoot()
    def writeZoned(rows: Seq[(Long, Option[Long])], path: String): Seq[String] = {
      rows.toDF("k", "z").repartition(1).write.mode("overwrite").parquet(path)
      TableFormat.listParquet(spark, path)
    }
    // A: fully inside the delete range, null-free -> metadata drop
    // B: bounds inside the range BUT holds null z rows -> MUST rewrite
    //    (a bounds-only drop would destroy the nulls)
    // C: boundary overlap plus nulls -> rewrite keeps out-of-range + nulls
    // D: disjoint -> carried by reference
    val fa = writeZoned((0L until 10L).map(i => (i, Some(100L + i))), s"$root/fa")
    val fb = writeZoned((10L until 20L).map(i =>
      (i, if (i % 2 == 0) Some(150L) else None)), s"$root/fb")
    val fc = writeZoned((20L until 30L).map(i =>
      (i, if (i == 29) None else Some(180L + (i - 20) * 10L))), s"$root/fc")
    val fd = writeZoned((30L until 40L).map(i => (i, Some(300L + i))), s"$root/fd")
    TableFormat.commitFiles(spark, root, "k", fa ++ fb ++ fc ++ fd, 256, 3,
      zoneCols = Seq("z"))
    val (snap, nDrop, nRewrite, nCarry) =
      TableFormat.deleteWhere(spark, root, root, "z", 100L, 199L)
    assert(nDrop == 1 && nRewrite == 2 && nCarry == 1,
      s"drop=$nDrop rewrite=$nRewrite carry=$nCarry")
    val got = TableFormat.read(spark, snap).orderBy("k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq
    // every null-z row SURVIVES (SQL: NULL never satisfies the range);
    // every z in [100,199] is gone; C's z >= 200 rows survive
    val expected =
      (10L until 20L).filter(_ % 2 == 1).map(i => (i, None)) ++
        (20L until 30L).collect {
          case i if i == 29 => (i, None)
          case i if 180L + (i - 20) * 10L >= 200L => (i, Some(180L + (i - 20) * 10L))
        } ++
        (30L until 40L).map(i => (i, Some(300L + i)))
    assert(got == expected.sortBy(_._1))
  }

  test("deleteKeys keeps null-key rows in rewritten files") {
    import spark.implicits._
    val root = freshRoot()
    Seq((Some(1L), 10.0), (Some(2L), 20.0), (None, 30.0), (Some(4L), 40.0))
      .toDF("k", "v").repartition(1).write.mode("overwrite").parquet(s"$root/fa")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/fa"), 256, 3)
    val snap = TableFormat.deleteKeys(spark, root, root, Seq(2L))
    val got = TableFormat.read(spark, snap).orderBy("v").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getDouble(1)))
      .toSeq
    // k=2 gone; the NULL-key row (no key set can name it) survives
    assert(got == Seq((Some(1L), 10.0), (None, 30.0), (Some(4L), 40.0)))
  }

  test("fileStats under nulls: all-null zone omits bounds, all-null key gets the sentinel, counts recorded") {
    import spark.implicits._
    val root = freshRoot()
    // one file whose z is ENTIRELY null (the getLong-NPE shape), one all-null key
    Seq((Some(1L), Option.empty[Long]), (Some(2L), Option.empty[Long]))
      .toDF("k", "z").repartition(1).write.mode("overwrite").parquet(s"$root/fz")
    Seq((Option.empty[Long], Some(5L)), (Option.empty[Long], Some(6L)))
      .toDF("k", "z").repartition(1).write.mode("overwrite").parquet(s"$root/fk")
    val stats = TableFormat.fileStats(spark,
      TableFormat.listParquet(spark, s"$root/fz") ++
        TableFormat.listParquet(spark, s"$root/fk"),
      "k", 256, 3, zoneCols = Seq("z"))
    val byNull = stats.partition(_.nulls("z") == 2L)
    val zNull = byNull._1.head  // the all-null-z file
    val kNull = byNull._2.head  // the all-null-key file
    assert(!zNull.zones.contains("z") && zNull.nulls("k") == 0L)
    assert(kNull.minKey == Long.MinValue && kNull.maxKey == Long.MaxValue &&
      kNull.nulls("k") == 2L && kNull.zones("z") == ((5L, 6L)))
    // scans stay exact: the boundless file is read, never guessed about
    val snap = TableFormat.commitFiles(spark, root, "k",
      stats.map(_.file), 256, 3, zoneCols = Seq("z"))
    val (scan, nRead, _) = TableFormat.scanZone(spark, snap, "z", 5L, 5L)
    assert(nRead == 2 && scan.collect().map(_.getLong(1)).toSeq == Seq(5L))
    // statsSummary extrema skip the sentinel file
    val (n, mn, mx) = TableFormat.statsSummary(snap)
    assert(n == 4L && mn == 1L && mx == 2L)
  }

  test("countRange is exact under nulls: files with nulls scan instead of trusting nRows") {
    import spark.implicits._
    val root = freshRoot()
    // bounds fully inside [0, 100] but half the rows are null-z: a
    // metadata-only count would report 10, truth is 5
    (0L until 10L).map(i => (i, if (i % 2 == 0) Some(50L) else Option.empty[Long]))
      .toDF("k", "z").repartition(1).write.mode("overwrite").parquet(s"$root/fa")
    val snap = TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/fa"), 256, 3, zoneCols = Seq("z"))
    val (cnt, fromMeta, scanned, skipped) =
      TableFormat.countRange(spark, snap, "z", 0L, 100L)
    assert(cnt == 5L && fromMeta == 0 && scanned == 1 && skipped == 0)
    // a genuinely null-free file still counts from metadata alone
    val root2 = freshRoot()
    (0L until 10L).map(i => (i, 50L)).toDF("k", "z")
      .repartition(1).write.mode("overwrite").parquet(s"$root2/fa")
    val snap2 = TableFormat.commitFiles(spark, root2, "k",
      TableFormat.listParquet(spark, s"$root2/fa"), 256, 3, zoneCols = Seq("z"))
    val (cnt2, fromMeta2, scanned2, _) =
      TableFormat.countRange(spark, snap2, "z", 0L, 100L)
    assert(cnt2 == 10L && fromMeta2 == 1 && scanned2 == 0)
  }

  test("replaceDataFiles refuses concurrent MoR deletes and in-scope appends (lost-update guard)") {
    import spark.implicits._
    val root = freshRoot()
    def writeRows(rows: Seq[(Long, Double)], path: String): Seq[String] = {
      rows.toDF("k", "v").repartition(1).write.mode("overwrite").parquet(path)
      TableFormat.listParquet(spark, path)
    }
    TableFormat.commitFiles(spark, root, "k",
      writeRows((1L to 10L).map(i => (i, i * 1.0)), s"$root/fa"), 256, 3)
    val base = TableFormat.snapshot(spark, root)
    def replacement(tag: String): (Seq[TableFormat.FileStat],
        org.apache.spark.sql.DataFrame) = {
      val files = writeRows((1L to 10L).map(i => (i, i * 2.0)), s"$root/$tag")
      (TableFormat.fileStats(spark, files, "k", 256, 3),
        spark.read.parquet(files: _*))
    }
    // concurrent merge-on-read delete between the scan and the commit:
    // replaced files all still live, but the replacement rows would
    // resurrect the masked keys — must fail loud, not silently win
    TableFormat.deleteKeysMoR(spark, root, root, Seq(3L))
    val (st1, df1) = replacement("r1")
    val e1 = intercept[TableFormat.CommitConflictException](
      TableFormat.replaceDataFiles(spark, root, base,
        base.files.map(_.file).toSet, st1, Some(df1), "update"))
    assert(e1.getMessage.contains("update"))
    // same guard for an append INTO the replaced key span (the
    // replacement file set was derived without it)
    val root2 = freshRoot()
    TableFormat.commitFiles(spark, root2, "k",
      writeRows((1L to 10L).map(i => (i, i * 1.0)), s"$root2/fa"), 256, 3)
    val base2 = TableFormat.snapshot(spark, root2)
    TableFormat.appendFiles(spark, root2,
      writeRows(Seq(5L -> 55.0), s"$root2/fb"))
    def replacement2(tag: String) = {
      val files = writeRows((1L to 10L).map(i => (i, i * 2.0)), s"$root2/$tag")
      (TableFormat.fileStats(spark, files, "k", 256, 3),
        spark.read.parquet(files: _*))
    }
    val (st2, df2) = replacement2("r2")
    intercept[TableFormat.CommitConflictException](
      TableFormat.replaceDataFiles(spark, root2, base2,
        base2.files.map(_.file).toSet, st2, Some(df2), "merge"))
    // an append OUTSIDE the span composes: both commits land
    val root3 = freshRoot()
    TableFormat.commitFiles(spark, root3, "k",
      writeRows((1L to 10L).map(i => (i, i * 1.0)), s"$root3/fa"), 256, 3)
    val base3 = TableFormat.snapshot(spark, root3)
    TableFormat.appendFiles(spark, root3,
      writeRows(Seq(100L -> 100.0), s"$root3/fb"))
    def replacement3(tag: String) = {
      val files = writeRows((1L to 10L).map(i => (i, i * 2.0)), s"$root3/$tag")
      (TableFormat.fileStats(spark, files, "k", 256, 3),
        spark.read.parquet(files: _*))
    }
    val (st3, df3) = replacement3("r3")
    val snap3 = TableFormat.replaceDataFiles(spark, root3, base3,
      base3.files.map(_.file).toSet, st3, Some(df3), "update")
    val got = TableFormat.read(spark, snap3).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == (1L to 10L).map(i => (i, i * 2.0)) :+ (100L -> 100.0))
  }
}
