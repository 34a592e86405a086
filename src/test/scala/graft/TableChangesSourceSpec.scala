package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.TableFormat

class TableChangesSourceSpec extends SparkTestBase {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_tcs").toString

  private def writeKv(pairs: Seq[(Long, Double)], path: String): String = {
    import spark.implicits._
    pairs.toDF("k", "v").repartition(1).write.mode("overwrite").parquet(path)
    path
  }

  private def runOnce(root: String, out: String, cp: String): Unit = {
    val q = spark.readStream.format("graft-table-changes").load(root)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish")
  }

  test("table-as-stream: appends emit, replace skipped, checkpoint restart exactly-once") {
    import spark.implicits._
    val root = freshRoot()
    val out = s"${freshRoot()}/out"; val cp = s"${freshRoot()}/cp"
    writeKv((1L to 10L).map(i => (i, i * 1.0)), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)        // v1 append
    TableFormat.upsertRowsMoR(spark, root, root,
      Seq(5L -> 55.0, 11L -> 11.0).toDF("k", "v"))                // v2 upsert
    TableFormat.compact(spark, root, root, 1)                     // v3 replace
    writeKv(Seq(20L -> 20.0), s"$root/w2")
    TableFormat.appendFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/w2"))                // v4 append
    runOnce(root, out, cp)
    def got() = spark.read.parquet(out)
      .select("_commit_version", "k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    // v1 emits the base, v2 emits ONLY its batch (the new row versions),
    // v3 (compaction) emits NOTHING, v4 its append
    val expected = ((1L to 10L).map(i => (1L, i, i * 1.0)) ++
      Seq((2L, 5L, 55.0), (2L, 11L, 11.0), (4L, 20L, 20.0))).sorted
    assert(got() == expected)
    // restart with the same checkpoint, no new commits: nothing re-emits
    runOnce(root, out, cp)
    assert(got() == expected)
    // a new commit after restart: only the delta appears
    writeKv(Seq(30L -> 30.0), s"$root/w3")
    TableFormat.appendFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/w3"))                // v5
    runOnce(root, out, cp)
    assert(got() == (expected :+ ((5L, 30L, 30.0))).sorted)
  }

  test("full streaming composition: table A -> V2 source -> CDC sink -> table B") {
    import spark.implicits._
    val aRoot = freshRoot(); val bRoot = freshRoot()
    val cp = s"${freshRoot()}/cp"
    writeKv((1L to 8L).map(i => (i, i * 1.0)), s"$aRoot/w1")
    TableFormat.commitFiles(spark, aRoot, "k",
      TableFormat.listParquet(spark, s"$aRoot/w1"), 256, 3)       // A v1
    TableFormat.upsertRowsMoR(spark, aRoot, aRoot,
      Seq(3L -> 33.0, 9L -> 9.0).toDF("k", "v"))                  // A v2
    // the stream's _commit_version doubles as the CDC version column:
    // latest-per-key within a batch falls out of the source's lineage
    val sink = graft.streaming.Streams.foreachBatchTableUpsertMoR(
      bRoot, bRoot, "k", "_commit_version", numBits = 256, numHashes = 3,
      lineage = "a2b")
    def tick(): Unit = {
      val q = spark.readStream.format("graft-table-changes").load(aRoot)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "stream did not finish")
    }
    tick()
    def bContent() = TableFormat
      .read(spark, TableFormat.snapshot(spark, bRoot))
      .select("k", "v").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def aContent() = TableFormat
      .read(spark, TableFormat.snapshot(spark, aRoot))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(bContent() == aContent()) // the upsert replaced k=3, added k=9
    // replay tick: both gates (source offset, sink batch_id) hold — B
    // does not move
    val bVer = TableFormat.versions(spark, bRoot).last
    tick()
    assert(TableFormat.versions(spark, bRoot).last == bVer)
    // more commits on A flow through incrementally on the next tick
    TableFormat.upsertRowsMoR(spark, aRoot, aRoot,
      Seq(9L -> 99.0).toDF("k", "v"))                             // A v3
    writeKv(Seq(20L -> 20.0), s"$aRoot/w2")
    TableFormat.appendFiles(spark, aRoot,
      TableFormat.listParquet(spark, s"$aRoot/w2"))               // A v4
    tick()
    assert(bContent() == aContent())
  }

  test("streaming a clone log (versions start above 1) emits from the clone point") {
    val src = freshRoot(); val tgt = freshRoot()
    val out = s"${freshRoot()}/out"; val cp = s"${freshRoot()}/cp"
    writeKv((1L to 5L).map(i => (i, i * 1.0)), s"$src/w1")
    TableFormat.commitFiles(spark, src, "k",
      TableFormat.listParquet(spark, s"$src/w1"), 256, 3)        // src v1
    TableFormat.deleteKeysMoR(spark, src, src, Seq(2L))          // src v2
    TableFormat.cloneTable(spark, src, tgt)                      // tgt log @ v2
    writeKv(Seq(9L -> 9.0), s"$tgt/w2")
    TableFormat.appendFiles(spark, tgt,
      TableFormat.listParquet(spark, s"$tgt/w2"))                // tgt v3
    runOnce(tgt, out, cp)
    val got = spark.read.parquet(out).select("_commit_version", "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // the clone commit (v2, the window's first live version) emits its
    // full file set — raw appended files, so the cloned manifest's
    // masked k=2 appears here (append-stream semantics, documented);
    // the clone-side append emits at v3
    assert(got == ((1L to 5L).map(i => (2L, i)) :+ ((3L, 9L))))
  }

  test("table-as-stream follows schema evolution with null back-fill") {
    import spark.implicits._
    val root = freshRoot()
    val out = s"${freshRoot()}/out"; val cp = s"${freshRoot()}/cp"
    writeKv(Seq(1L -> 1.0), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)
    Seq((2L, 2.0, "tag")).toDF("k", "v", "t").repartition(1)
      .write.mode("overwrite").parquet(s"$root/w2")
    TableFormat.appendFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/w2"))
    runOnce(root, out, cp)
    val got = spark.read.parquet(out).orderBy("k")
      .select("k", "t", "_commit_version").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSeq
    assert(got == Seq((1L, None, 1L), (2L, Some("tag"), 2L)))
  }

  test("oldest survivor is op=replace after retention: a fresh stream still emits the base") {
    val root = freshRoot()
    val out = s"${freshRoot()}/out"; val cp = s"${freshRoot()}/cp"
    writeKv((1L to 10L).map(i => (i, i * 1.0)), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)        // v1 append
    TableFormat.compact(spark, root, root, 1)                     // v2 replace
    writeKv(Seq(20L -> 20.0), s"$root/w2")
    TableFormat.appendFiles(spark, root,
      TableFormat.listParquet(spark, s"$root/w2"))                // v3 append
    // expire v1: the oldest LIVE version is now the op=replace compaction
    TableFormat.expireSnapshots(spark, root, keepLast = 2,
      dataDirs = Seq(root), graceMs = 0L)
    assert(TableFormat.versions(spark, root) == Seq(2L, 3L))
    runOnce(root, out, cp)
    // v2 has no live predecessor: it IS the base — its full file set
    // must emit (the replace skip would silently lose rows 1..10)
    val got = spark.read.parquet(out)
      .select("_commit_version", "k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val expected = ((1L to 10L).map(i => (2L, i)) :+ ((3L, 20L))).sorted
    assert(got == expected)
  }

  test("DSv2 table-to-table: graft-table-changes source into the graft-table streaming sink, exactly-once") {
    val aRoot = freshRoot(); val bRoot = freshRoot(); val cp = s"${freshRoot()}/cp"
    writeKv((1L to 10L).map(i => (i, i * 1.0)), s"$aRoot/w1")
    TableFormat.commitFiles(spark, aRoot, "k",
      TableFormat.listParquet(spark, s"$aRoot/w1"), 256, 3)       // A v1
    TableFormat.createEmpty(spark, bRoot, "k", "k BIGINT, v DOUBLE") // B v1
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-table-changes").load(aRoot)
        .select("k", "v")
        .writeStream.format("graft-table")
        .option("path", bRoot).option("lineage", cp)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stream did not finish")
    }
    runOnce()
    def bContent() = TableFormat.read(spark, TableFormat.snapshot(spark, bRoot))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(bContent() == (1L to 10L).map(i => (i, i * 1.0)))
    assert(TableFormat.versions(spark, bRoot) == Seq(1L, 2L))
    // restart, nothing new on A: B must not move (in-log replay gate +
    // source offsets both hold)
    runOnce()
    assert(TableFormat.versions(spark, bRoot) == Seq(1L, 2L))
    // a new commit on A flows through as exactly one append on B
    writeKv(Seq(20L -> 20.0), s"$aRoot/w2")
    TableFormat.appendFiles(spark, aRoot,
      TableFormat.listParquet(spark, s"$aRoot/w2"))               // A v2
    runOnce()
    assert(TableFormat.versions(spark, bRoot) == Seq(1L, 2L, 3L))
    assert(bContent() == ((1L to 10L).map(i => (i, i * 1.0)) :+ ((20L, 20.0))))
    // the path-based BATCH read serves the same snapshot (vectorized path)
    val viaDs = spark.read.format("graft-table").load(bRoot)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaDs == bContent())
    // a different checkpoint lineage is refused, not silently deduped
    val cp2 = s"${freshRoot()}/cp2"
    val q2 = spark.readStream.format("graft-table-changes").load(aRoot)
      .select("k", "v")
      .writeStream.format("graft-table")
      .option("path", bRoot).option("lineage", cp2)
      .option("checkpointLocation", cp2)
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[Exception](q2.awaitTermination(120000))
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(e).contains("lineage"), msgs(e))
  }

  test("admission control: a versioned backlog drains across bounded micro-batches, results identical to unthrottled") {
    import spark.implicits._
    val root = freshRoot()
    // a 6-version backlog (v2 carries TWO files — the file cap must
    // count files, not versions)
    writeKv((1L to 10L).map(i => (i, i * 1.0)), s"$root/w1")
    TableFormat.commitFiles(spark, root, "k",
      TableFormat.listParquet(spark, s"$root/w1"), 256, 3)          // v1
    (2 to 6).foreach { v =>
      val path = s"$root/w$v"
      if (v == 2)
        (1 to 2).foreach(j => writeKv(Seq((v * 100L + j, v * 1.0)),
          s"$path/p$j"))
      else writeKv(Seq((v * 100L, v * 1.0)), path)
      TableFormat.appendFiles(spark, root,
        TableFormat.listParquetRecursive(spark, path))              // v2..v6
    }
    def drain(out: String, cp: String, opts: Map[String, String]): Int = {
      val r = spark.readStream.format("graft-table-changes")
        .options(opts).load(root)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      assert(r.awaitTermination(300000), "stream did not finish")
      // committed batches = offset files in the checkpoint (numeric
      // names only — the dir also holds .crc shadows)
      new java.io.File(s"$cp/offsets").list().count(_.forall(_.isDigit))
    }
    def content(out: String) = spark.read.parquet(out)
      .select("_commit_version", "k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val base = s"${freshRoot()}"
    // unthrottled: the whole backlog in ONE batch
    val b0 = drain(s"$base/o0", s"$base/c0", Map.empty)
    assert(b0 == 1, s"unthrottled drained in $b0 batches")
    // max_versions_per_trigger=2 over 6 pending versions -> 3 batches,
    // offsets resuming mid-backlog, identical content
    val b1 = drain(s"$base/o1", s"$base/c1",
      Map("max_versions_per_trigger" -> "2"))
    assert(b1 == 3, s"version-throttled drained in $b1 batches")
    assert(content(s"$base/o1") == content(s"$base/o0"))
    // max_files_per_trigger=2: v1(1 file)+v2(2 files) would exceed the
    // cap -> v1 alone, then v2 (its 2 files admitted together: a version
    // is never split), then v3+v4, v5+v6 -> 4 batches
    val b2 = drain(s"$base/o2", s"$base/c2",
      Map("max_files_per_trigger" -> "2"))
    assert(b2 == 4, s"file-throttled drained in $b2 batches")
    assert(content(s"$base/o2") == content(s"$base/o0"))
    // a restart on the drained checkpoint ships nothing new
    val b3 = drain(s"$base/o1", s"$base/c1",
      Map("max_versions_per_trigger" -> "2"))
    assert(content(s"$base/o1") == content(s"$base/o0"))
    // max_bytes_per_trigger from RECORDED commit bytes: each version's
    // parquet files are a few hundred bytes; a cap of ~1.5 files forces
    // roughly one version per batch (never fewer than 3 batches over 6
    // versions), a huge cap drains in one — content identical either way
    val snap = TableFormat.snapshot(spark, root)
    assert(snap.files.forall(_.bytes > 0), snap.files.map(_.bytes))
    val oneFile = snap.files.map(_.bytes).max
    val b4 = drain(s"$base/o4", s"$base/c4",
      Map("max_bytes_per_trigger" -> (oneFile * 3 / 2).toString))
    assert(b4 >= 3, s"byte-throttled drained in $b4 batches")
    assert(content(s"$base/o4") == content(s"$base/o0"))
    val b5 = drain(s"$base/o5", s"$base/c5",
      Map("max_bytes_per_trigger" -> (1L << 40).toString))
    assert(b5 == 1, s"loose byte cap drained in $b5 batches")
    assert(content(s"$base/o5") == content(s"$base/o0"))
  }

  test("legacy 2-level parquet LIST forms read by the spec's backward-compat rule (array / name_tuple groups are elements)") {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Type, Types => PT}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

    val root = freshRoot()
    val out = s"${freshRoot()}/out"; val cp = s"${freshRoot()}/cp"
    // a foreign-written legacy file: two single-field repeated groups
    // that are ELEMENTS by parquet's documented rule ("array" name /
    // list name + "_tuple") — the tags_tuple element's SOLE member is
    // deliberately named "element", the exact shape a field-name
    // heuristic would misparse as a 3-level holder
    val msg = PT.buildMessage()
      .addField(PT.primitive(INT64, Type.Repetition.REQUIRED).named("k"))
      .addField(PT.buildGroup(Type.Repetition.OPTIONAL)
        .as(LogicalTypeAnnotation.listType())
        .addField(PT.buildGroup(Type.Repetition.REPEATED)
          .addField(PT.primitive(BINARY, Type.Repetition.OPTIONAL)
            .as(LogicalTypeAnnotation.stringType()).named("element"))
          .named("tags_tuple"))
        .named("tags"))
      .addField(PT.buildGroup(Type.Repetition.OPTIONAL)
        .as(LogicalTypeAnnotation.listType())
        .addField(PT.buildGroup(Type.Repetition.REPEATED)
          .addField(PT.primitive(INT64, Type.Repetition.OPTIONAL).named("a"))
          .named("array"))
        .named("arr"))
      .named("legacy")
    val file = s"$root/w1/legacy-0.parquet"
    val w = ExampleParquetWriter.builder(HadoopOutputFile.fromPath(
        new org.apache.hadoop.fs.Path(file),
        spark.sessionState.newHadoopConf()))
      .withType(msg).build()
    val f = new SimpleGroupFactory(msg)
    try (1L to 3L).foreach { i =>
      val g = f.newGroup()
      g.add("k", i)
      val tg = g.addGroup("tags")
      (1L to i).foreach(j => tg.addGroup("tags_tuple").add("element", s"t$i$j"))
      val ag = g.addGroup("arr")
      (1L to i).foreach(j => ag.addGroup("array").add("a", i * 10 + j))
      w.write(g)
    } finally w.close()
    // commitFiles derives the committed DDL through Spark's own parquet
    // converter — ARRAY<STRUCT<element STRING>> / ARRAY<STRUCT<a BIGINT>>
    // by the same backward-compat rule the custom reader must mirror
    TableFormat.commitFiles(spark, root, "k", Seq(file), 256, 3)
    runOnce(root, out, cp)
    val got = spark.read.parquet(out).orderBy("k").collect().map { r =>
      (r.getLong(r.fieldIndex("k")),
        r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("tags"))
          .map(_.getString(0)),
        r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("arr"))
          .map(_.getLong(0)))
    }.toSeq
    assert(got == (1L to 3L).map(i =>
      (i, (1L to i).map(j => s"t$i$j"), (1L to i).map(j => i * 10 + j))))
    // the same file reads identically through Spark's native converter
    // (the rule is parquet's, not ours)
    val native = spark.read.parquet(file).orderBy("k").collect().map { r =>
      (r.getLong(r.fieldIndex("k")),
        r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("tags"))
          .map(_.getString(0)),
        r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("arr"))
          .map(_.getLong(0)))
    }.toSeq
    assert(native == got)
  }
}
