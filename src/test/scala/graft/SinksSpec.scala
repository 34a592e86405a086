package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.Sinks

/** Dynamic partition overwrite: an incremental batch must replace exactly its
  * own months and leave cold history files untouched. */
class SinksSpec extends SparkTestBase {
  import spark.implicits._

  private def txns(rows: (String, String, Double)*) =
    rows.toSeq.toDF("id", "d", "amount").withColumn("d", $"d".cast("date"))

  test("writes month partitions and reads back without the partition column") {
    val path = Files.createTempDirectory("graft_sink").toString
    Sinks.writeMonthPartitioned(
      txns(("a", "2026-01-05", 1.0), ("b", "2026-02-10", 2.0), ("c", "2026-03-15", 3.0)),
      path, dateCol = "d")
    assert(Seq("2026-01", "2026-02", "2026-03").forall(m =>
      Files.isDirectory(Paths.get(s"$path/__month=$m"))))
    val back = Sinks.readMonthPartitioned(spark, path)
    assert(back.columns.toSeq == Seq("id", "d", "amount"))
    assert(back.count() == 3)
  }

  test("K3 sheet CSV: one part file, header row, pinned column order") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/sheet"
    Sinks.writeSheetCsv(
      txns(("a", "2026-01-05", 1.5), ("b", "2026-02-10", 2.0)).select("id", "amount", "d"),
      dir)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(parts.length == 1) // a sheet is single-file
    val lines = scala.io.Source.fromFile(parts.head).getLines().toSeq
    assert(lines.head == "id,amount,d") // header preserves the frame's order
    assert(lines.size == 3)
  }

  test("K4 debug sink: silent no-op when disabled, JSON capture when enabled (v3:231-241)") {
    val df = txns(("a", "2026-01-05", 1.0))
    val dir = Files.createTempDirectory("graft_dbg").toString
    spark.conf.unset("spark.graft.debug")
    try {
      assert(!Sinks.writeDebugJson(df, "probe")) // flag absent -> no-op
      spark.conf.set("spark.graft.debug", "false")
      assert(!Sinks.writeDebugJson(df, "probe")) // flag off -> no-op
      assert(!Files.exists(Paths.get(s"$dir/probe")))
      spark.conf.set("spark.graft.debug", "true")
      spark.conf.set("spark.graft.debug.dir", dir)
      assert(Sinks.writeDebugJson(df, "probe"))
      val back = spark.read.json(s"$dir/probe")
      assert(back.count() == 1 && back.columns.sorted.toSeq == Seq("amount", "d", "id"))
    } finally {
      spark.conf.unset("spark.graft.debug")
      spark.conf.unset("spark.graft.debug.dir")
    }
  }

  test("F4 lenient date parse: reference fallback semantics incl. the one-reachable-format quirk") {
    val rows = Seq(
      "2020-01-05",                      // %Y-%m-%d
      "2020-1-5",                        // strptime tolerates unpadded
      "2020-01-05T23:30:00-05:00",       // ISO datetime: date AS WRITTEN, no UTC shift
      "2020-01-05T07:00:00Z",            // Z tolerated
      "1/5/2020",                        // %m/%d/%Y — the only reachable fallback
      "5/4/2020",                        // ambiguous: %m/%d wins (month=5), like the reference
      "31/12/2020",                      // %d/%m/%Y is UNREACHABLE -> passthrough
      "2020/01/05",                      // %Y/%m/%d is UNREACHABLE -> passthrough
      "garbage", "").toDF("s")
    val got = rows.select(Functions.sheets_date_formula_lenient($"s").as("f"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "=DATE(2020,1,5)", "=DATE(2020,1,5)", "=DATE(2020,1,5)", "=DATE(2020,1,5)",
      "=DATE(2020,1,5)", "=DATE(2020,5,4)", "31/12/2020", "2020/01/05",
      "garbage", ""))
  }

  test("replaying a window rewrites only its partitions; cold months keep their files") {
    val path = Files.createTempDirectory("graft_sink2").toString
    Sinks.writeMonthPartitioned(
      txns(("a", "2026-01-05", 1.0), ("b", "2026-02-10", 2.0)), path, dateCol = "d")
    def filesIn(m: String) =
      Files.list(Paths.get(s"$path/__month=$m")).iterator()
    val janBefore = { val it = filesIn("2026-01"); val s = new StringBuilder; it.forEachRemaining(p => s ++= p.toString + "\n"); s.toString }

    // second batch touches only February, with corrected amounts
    Sinks.writeMonthPartitioned(
      txns(("b", "2026-02-10", 20.0), ("b2", "2026-02-11", 21.0)), path, dateCol = "d")

    val janAfter = { val it = filesIn("2026-01"); val s = new StringBuilder; it.forEachRemaining(p => s ++= p.toString + "\n"); s.toString }
    assert(janAfter == janBefore, "January partition files must be untouched")

    val back = Sinks.readMonthPartitioned(spark, path).orderBy("id")
      .select("id", "amount").as[(String, Double)].collect().toSeq
    assert(back == Seq(("a", 1.0), ("b", 20.0), ("b2", 21.0)),
      s"February must be replaced, January kept: $back")
  }

  test("writeCompacted sizes file count from the byte estimate") {
    val path1 = Files.createTempDirectory("graft_compact1").toString
    val small = spark.range(1000).selectExpr("id", "CAST(id AS STRING) AS s")
    Sinks.writeCompacted(small, path1, targetBytes = 1L << 30) // 1 GiB target
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(path1) == 1, "tiny data under a big target -> one file")

    val path2 = Files.createTempDirectory("graft_compact2").toString
    val bigger = spark.range(200000).selectExpr("id", "repeat('x', 100) AS pad")
    Sinks.writeCompacted(bigger, path2, targetBytes = 1L << 20) // 1 MiB target
    assert(parquetFiles(path2) > 1, "data over the target must split into multiple files")
    // read-back integrity
    assert(spark.read.parquet(path2).count() == 200000)
  }

  test("restores the prior partitionOverwriteMode setting") {
    val path = Files.createTempDirectory("graft_sink3").toString
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    Sinks.writeMonthPartitioned(txns(("a", "2026-01-05", 1.0)), path, dateCol = "d")
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static")
  }
}
