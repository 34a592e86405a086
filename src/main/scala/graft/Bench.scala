package graft

import java.nio.file.{Files, Paths}

/** Benchmark main: runs every SparkEntry query against SPARK_GRAFT_SF_DIR,
  * forcing full computation through the noop sink (a bare count() would let
  * Catalyst prune the computed columns away), and emits one JSON line — to
  * stdout AND to bench_out.json (sbt's [info] prefixing mangles stdout for
  * downstream parsers).
  *
  * Failures are explicit: a failed query records -1.0 (never a fast-looking
  * elapsed time) and its message lands in "errors", so a broken query can
  * not silently inflate an all-green total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    // machine-load provenance: round-over-round comparisons kept needing
    // the driver's run as tiebreaker because committed archives ran on a
    // loaded box with no record of it — stamp the 1-minute load average
    // at start and end so an artifact-only reader can discount a noisy run
    def loadAvg(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadAvg()
    val spark = GraftSession.get()
    // JIT + session warm-up so per-query numbers measure the plan, not JVM startup
    spark.range(1000000).selectExpr("sum(id)").collect()
    // per-query warm-up at the smallest SF: compiles each plan's codegen and
    // loads its parquet footers once, so the timed run below measures
    // steady-state throughput at the target SF instead of one-shot
    // JIT/codegen latency (which dominated run-to-run variance)
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      // query failures surface in the timed run; fatal JVM errors
      // (OutOfMemoryError etc.) must abort, not time a corrupted JVM
      catch { case scala.util.control.NonFatal(_) => () }
    }
    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // MIN-OF-N timed passes (N >= 3 since r14 — the round-13 same-code
    // 179.6->227.9 s spread showed two passes under-sample host noise),
    // per-query min, with a LOAD STAMP taken at each pass boundary: a
    // single pass is exposed to transient machine load (an unrelated
    // burst inflates a query window 2-3x); the min of N spaced runs of
    // an identical deterministic plan is the steady-state number the
    // bench is defined to report, and the per-pass stamps let preflight
    // (and artifact readers) compare min-to-min ONLY when the stamps
    // say both runs were flat.
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES").map(_.toInt).getOrElse(3)
    val passLoads = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to passes) {
      passLoads += loadAvg()
      SparkEntry.queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val t = (System.nanoTime() - t0) / 1e9
          if (!times.get(name).exists(p => p >= 0 && p <= t)) times(name) = t
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            if (!times.get(name).exists(_ >= 0)) times(name) = -1.0
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("""[\p{Cntrl}"\\]""", " ").take(160)
        }
      }
    }
    // a query that failed in one pass but succeeded in the other has a valid
    // time; "failed"/"errors" report only queries with NO successful run
    errors.filterInPlace { case (name, _) => !times.get(name).exists(_ >= 0) }
    // Locale.ROOT formatting: the default-locale f"" interpolator would emit
    // comma decimals ("0,123") under e.g. de_DE — invalid JSON downstream
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = times.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = times.values.filter(_ >= 0).sum
    // entry-registry annotations (e.g. d05's deliberate scaling contrast)
    // ride along so artifact-only readers see documented postures inline
    val flagsJson = SparkEntry.entryFlags
      .map { case (k, v) => "\"" + k + "\":\"" + v.replace("\"", "'") + "\"" }
      .mkString("{", ",", "}")
    val passLoadsJson = passLoads.map(num).mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"failed":${errors.size},"errors":$errJson,"flags":$flagsJson,"passes":$passes,"agg":"per-entry min of passes","load_avg":{"start":${num(loadStart)},"per_pass":$passLoadsJson,"end":${num(loadAvg())},"cores":${Runtime.getRuntime.availableProcessors()}},"sf":"$sfDir"}"""
    println(line)
    Files.writeString(Paths.get("bench_out.json"), line + "\n")
    spark.stop()
  }
}
