package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout: interleaving correctness, bijectivity, and the actual
  * pruning property — z-ordered files cover narrow ranges on BOTH
  * dimensions where a single-column sort leaves the other dimension's
  * per-file range at full domain width. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private def refZ(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zvalue matches the reference interleave and is a bijection") {
    val pairs = spark.range(4096).select(
      (col("id") % 64).as("a"), (col("id") / 64).cast("long").as("b"))
    val got = pairs.select(col("a"), col("b"),
        Layout.zvalue(col("a"), col("b"), bits = 6).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == refZ(a, b, 6), s"($a,$b)") }
    // all 64x64 grid points map to distinct z-values covering [0, 4096)
    assert(got.map(_._3).toSet == (0L until 4096L).toSet)
  }

  test("z-ordered files cover narrow ranges on BOTH dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // 100k rows over a 256x256 grid, uncorrelated dimensions
    val df = spark.range(100000).select(
      pmod(col("id") * 2654435761L, lit(256)).as("a"),
      pmod(col("id") * 40503L, lit(256)).as("b"))
    Layout.writeZOrdered(df, col("a"), col("b"), s"$dir/z", numFiles = 16, bits = 8)
    // single-column sort: perfect on a, useless on b
    df.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(s"$dir/bya")
    def avgSpans(path: String): (Double, Double) = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max(col("a")) - min(col("a")), max(col("b")) - min(col("b")))
          .as[(Long, Long)].head()
        (r._1.toDouble, r._2.toDouble)
      }
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }
    val (za, zb) = avgSpans(s"$dir/z")
    val (sa, sb) = avgSpans(s"$dir/bya")
    // z-order: both dimensions well under domain width (256)
    assert(za < 100 && zb < 100, s"z-order spans: a=$za b=$zb")
    // column sort: a is tight but b stays at ~full domain
    assert(sa < 32, s"sort-by-a span a=$sa")
    assert(sb > 200, s"sort-by-a span b=$sb (should be ~255)")
    assert(za < sb / 2 && zb < sb / 2)
  }

  test("point predicates skip row groups at the SCAN on both z dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zscan").toString
    // low byte / high byte of id: genuinely independent dimensions (an
    // affine pair like a=177*id%256, b=55*id%256 is secretly bijective —
    // b constant within each a-run — which lets page stats prune even the
    // unsorted control and voids the comparison)
    val df = spark.range(100000).select(
      pmod(col("id"), lit(256)).as("a"),
      pmod(floor(col("id") / 256), lit(256)).cast("long").as("b"))
    Layout.writeZOrdered(df, col("a"), col("b"), s"$dir/z", numFiles = 16, bits = 8)
    df.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(s"$dir/bya")
    // rows the scan node actually EMITS after parquet row-group/page
    // pruning by the pushed filter — the measurable form of file skipping
    def scanned(path: String, pred: org.apache.spark.sql.Column): Long = {
      val q = spark.read.parquet(path).filter(pred)
      q.collect()
      val scans = q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "expected a FileSourceScanExec leaf")
      assert(scans.head.metadata("PushedFilters").contains("EqualTo"),
        "predicate must reach the parquet scan")
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val total = 100000L
    val zA = scanned(s"$dir/z", col("a") === 7)
    val zB = scanned(s"$dir/z", col("b") === 7)
    val sA = scanned(s"$dir/bya", col("a") === 7)
    val sB = scanned(s"$dir/bya", col("b") === 7)
    // z-order: BOTH dimensions prune well below a full scan
    assert(zA < total * 6 / 10, s"z-scan on a scanned $zA of $total")
    assert(zB < total * 6 / 10, s"z-scan on b scanned $zB of $total")
    // single-column sort: pruning on a, none on b — and z beats it on b
    assert(sA < total * 2 / 10, s"sort-by-a scan on a scanned $sA")
    assert(sB > total * 9 / 10, s"sort-by-a scan on b scanned $sB (expected ~full)")
    assert(zB < sB / 2, s"z-order must beat single-column sort on b: $zB vs $sB")
  }

  test("zvalueN: 2-col form equals zvalue; 3-col form is a bijection") {
    val pairs = spark.range(1024).select(
      (col("id") % 32).as("a"), (col("id") / 32).cast("long").as("b"))
    val eq = pairs.select(
        (Layout.zvalueN(Seq(col("a"), col("b")), 5) === Layout.zvalue(col("a"), col("b"), 5)).as("ok"))
      .as[Boolean].collect()
    assert(eq.forall(identity))
    val triples = spark.range(512).select(
      (col("id") % 8).as("a"), ((col("id") / 8) % 8).cast("long").as("b"),
      (col("id") / 64).cast("long").as("c"))
    val z3 = triples.select(Layout.zvalueN(Seq(col("a"), col("b"), col("c")), 3).as("z"))
      .as[Long].collect()
    assert(z3.toSet == (0L until 512L).toSet, "3-col interleave must cover [0, 8^3) bijectively")
    intercept[IllegalArgumentException] { Layout.zvalueN(Seq(lit(1L)), 5) }
    intercept[IllegalArgumentException] { Layout.zvalueN(Seq(lit(1L), lit(1L), lit(1L)), 22) }
  }

  test("zvalue validates bits range") {
    intercept[IllegalArgumentException] { Layout.zvalue(lit(1L), lit(1L), bits = 0) }
    intercept[IllegalArgumentException] { Layout.zvalue(lit(1L), lit(1L), bits = 32) }
  }

  private def leafParquetFiles(dir: java.io.File): Seq[java.io.File] =
    if (dir.isDirectory) dir.listFiles().toSeq.flatMap(leafParquetFiles)
    else if (dir.getName.endsWith(".parquet")) Seq(dir) else Seq.empty

  test("compact executes the plan: one file per group, rows routed per plan, identity") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    // pre-image: 2 table partitions x 20 "files" of varying row counts
    val pre = spark.range(4000).select(
      (col("id") % 2).cast("string").as("pt"),
      (col("id") % 20).as("file_id"),
      col("id").as("v"))
    val listing = pre.groupBy(col("pt"), col("file_id"))
      .agg((count(lit(1)) * 8).as("bytes"))
    val plan = Layout.compactionPlan(listing, Seq("pt"), "file_id", "bytes",
      targetBytes = 500)
    Layout.compact(pre, plan, Seq("pt"), "file_id", s"$dir/out")
    // exactly ONE parquet file per (pt, compaction_group) dir, and the
    // set of dirs equals the plan's group set
    val planGroups = plan.select(col("pt"), col("compaction_group"))
      .distinct().as[(String, Long)].collect().toSet
    val groupDirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("pt=")).flatMap { ptDir =>
        ptDir.listFiles().filter(_.getName.startsWith("compaction_group="))
          .map(g => (ptDir.getName.stripPrefix("pt="),
            g.getName.stripPrefix("compaction_group=").toLong, g))
      }
    assert(groupDirs.map(g => (g._1, g._2)).toSet == planGroups)
    groupDirs.foreach { case (pt, g, d) =>
      assert(leafParquetFiles(d).size == 1, s"pt=$pt group=$g must be ONE file")
    }
    // every row landed in the group its file was planned into
    val back = spark.read.parquet(s"$dir/out")
    val misrouted = back
      .join(plan.select(col("pt"), col("file_id"), col("compaction_group").as("_want")),
        Seq("pt", "file_id"))
      .filter(col("compaction_group") =!= col("_want")).count()
    assert(misrouted == 0L)
    // identity: nothing lost or duplicated by the rewrite
    val (n0, s0) = pre.agg(count(lit(1)), sum(col("v"))).as[(Long, Long)].head()
    val (n1, s1) = Layout.readCompacted(spark, s"$dir/out")
      .agg(count(lit(1)), sum(col("v"))).as[(Long, Long)].head()
    assert((n0, s0) == (n1, s1))
    // group sizes track the plan: each group's row count equals the sum of
    // its member files' rows
    val wantSizes = listing
      .join(plan.select("pt", "file_id", "compaction_group"), Seq("pt", "file_id"))
      .groupBy(col("pt"), col("compaction_group"))
      .agg((sum(col("bytes")) / 8).cast("long").as("rows"))
      .as[(String, Long, Long)].collect().toSet
    val gotSizes = back.groupBy(col("pt"), col("compaction_group"))
      .agg(count(lit(1)).as("rows")).as[(String, Long, Long)].collect().toSet
    assert(gotSizes == wantSizes)
  }

  test("recluster rewrites flagged partitions to depth<=2 and passes clean ones through") {
    val dir = java.nio.file.Files.createTempDirectory("graft_recluster").toString
    // pt=A: every file spans the whole z domain (depth = nFiles, decayed);
    // pt=B: files cover disjoint z ranges (depth 1, healthy)
    val a = spark.range(1000).select(lit("A").as("pt"),
      (col("id") % 10).cast("string").as("file_id"),
      floor(col("id") / 10).cast("long").as("z"))
    val b = spark.range(1000).select(lit("B").as("pt"),
      floor(col("id") / 100).cast("long").cast("string").as("file_id"),
      col("id").as("z"))
    val pre = a.unionByName(b)
    def listingOf(df: org.apache.spark.sql.DataFrame, fileCol: String) =
      df.groupBy(col("pt"), col(fileCol).as("file_id"))
        .agg(min(col("z")).as("zmin"), max(col("z")).as("zmax"))
    val plan = Layout.reclusterPlan(listingOf(pre, "file_id"), Seq("pt"),
      "file_id", "zmin", "zmax", maxDepth = 4)
    // sanity: A flagged, B not
    assert(plan.filter(col("needs_rewrite")).select("pt").distinct()
      .as[String].collect().toSeq == Seq("A"))
    Layout.recluster(pre, plan, Seq("pt"), "file_id", "z", s"$dir/out",
      filesPerPartition = 5)
    val back = spark.read.parquet(s"$dir/out")
    // A was re-split into 5 contiguous-range files; B kept its 10 original
    val aFiles = back.filter(col("pt") === "A").select("_file").distinct()
      .as[String].collect().toSet
    val bFiles = back.filter(col("pt") === "B").select("_file").distinct()
      .as[String].collect().toSet
    assert(aFiles == (0 until 5).map(k => s"z$k").toSet, s"got $aFiles")
    assert(bFiles == (0 until 10).map(_.toString).toSet, s"got $bFiles")
    // B's per-file ranges are byte-identical to the pre-image's
    val bPre = listingOf(b, "file_id").as[(String, String, Long, Long)].collect().toSet
    val bPost = listingOf(back.filter(col("pt") === "B"), "_file")
      .as[(String, String, Long, Long)].collect().toSet
    assert(bPost == bPre)
    // re-running the planner over the NEW layout: everything within budget,
    // and the rewritten partition is (near-)perfectly clustered
    val rePlan = Layout.reclusterPlan(listingOf(back, "_file"), Seq("pt"),
      "file_id", "zmin", "zmax", maxDepth = 4)
    assert(rePlan.filter(col("needs_rewrite")).count() == 0L)
    assert(rePlan.filter(col("pt") === "A").agg(max(col("depth")))
      .head().getLong(0) <= 2L)
    // identity: nothing lost or duplicated
    assert(back.count() == 2000L)
    assert(back.agg(sum(col("z"))).head().getLong(0)
      == pre.agg(sum(col("z"))).head().getLong(0))
  }

  test("manifest scan: zones prune files, results identical to a full scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest").toString
    val data = spark.range(10000).select(col("id").as("k"),
      (col("id") % 7).as("g"))
    data.repartitionByRange(10, col("k")).write.mode("overwrite").parquet(s"$dir/t")
    val manifest = Layout.buildManifest(spark, s"$dir/t", "k")
    val mRows = manifest.collect()
    assert(mRows.length == 10) // one row per file
    assert(mRows.map(_.getLong(3)).sum == 10000L)

    // mid-range query: clustered layout must skip most files
    val (scan, nSel, nTot) = Layout.manifestScan(spark, manifest, "k",
      lit(2000L), lit(2999L))
    assert(nTot == 10 && nSel < 4, s"selected $nSel of $nTot")
    val got = scan.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toSet
    val full = data.filter(col("k") >= 2000L && col("k") <= 2999L)
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toSet
    assert(got == full)

    // out-of-range query: zero files read, empty result, schema intact
    val (empty, nSelE, _) = Layout.manifestScan(spark, manifest, "k",
      lit(50000L), lit(60000L))
    assert(nSelE == 0)
    assert(empty.columns.toSeq == Seq("k", "g") && empty.count() == 0L)
  }

  test("targeted delete rewrites only bloom-hit files, result equals the anti-join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tdel").toString
    val data = spark.range(10000).select(col("id").as("k"), (col("id") % 5).as("v"))
    // range-clustered: each file owns a contiguous 1000-key slice
    data.repartitionByRange(10, col("k")).write.mode("overwrite").parquet(s"$dir/t")
    val manifest = Layout.buildBloomManifest(spark, s"$dir/t", "k",
      numBits = 1 << 14, numHashes = 5)
    val deleteKeys = Seq(1500L, 1501L, 1777L).toDF("k")
    val (result, touched, total) = Layout.targetedDelete(spark, manifest, "k",
      deleteKeys, s"$dir/out", numBits = 1 << 14, numHashes = 5)
    assert(total == 10)
    // all three keys live in one slice; blooms may false-positive a file
    // or two extra, never miss one
    assert(touched >= 1 && touched <= 3, s"touched=$touched")
    assert(result.count() == 9997L)
    assert(result.filter(col("k").isin(1500L, 1501L, 1777L)).count() == 0L)
    val expect = data.filter(!col("k").isin(1500L, 1501L, 1777L))
      .agg(sum(col("k")), sum(col("v"))).head()
    val got = result.agg(sum(col("k")), sum(col("v"))).head()
    assert(got == expect)
  }

  // The round-9 version-log tests moved to TableFormatSpec: the
  // whole-log-rewrite writer (writeVersionLog/readAsOf) was replaced by
  // the append-only CAS-committed TableFormat layer.
}
