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
}
