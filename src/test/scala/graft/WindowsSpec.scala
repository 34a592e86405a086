package graft

import org.apache.spark.sql.functions._

import graft.operators.Windows

/** SCD2 interval compression: change-point selection, validity ranges,
  * null-safe value comparison, and the round-trip property (expanding the
  * intervals reproduces the original series). */
class WindowsSpec extends SparkTestBase {
  import spark.implicits._

  test("scd2Compress keeps change points with [valid_from, valid_to) ranges") {
    val snaps = Seq(
      (1L, 1, "gold"), (1L, 2, "gold"), (1L, 3, "silver"), (1L, 4, "silver"),
      (1L, 5, "gold"),
      (2L, 1, "bronze"), (2L, 2, "bronze")
    ).toDF("cust", "day", "tier")
    val got = Windows.scd2Compress(snaps, Seq("cust"), "day", Seq("tier"))
      .orderBy("cust", "valid_from")
      .as[(Long, String, Int, Option[Int])].collect().toSeq
    assert(got == Seq(
      (1L, "gold", 1, Some(3)),
      (1L, "silver", 3, Some(5)),
      (1L, "gold", 5, None),
      (2L, "bronze", 1, None)))
  }

  test("scd2AsOf returns exactly the version valid at the probe point") {
    val snaps = Seq(
      (1L, 1, "gold"), (1L, 2, "gold"), (1L, 3, "silver"), (1L, 5, "gold"),
      (2L, 4, "bronze"), (2L, 5, "bronze")
    ).toDF("cust", "day", "tier")
    val hist = Windows.scd2Compress(snaps, Seq("cust"), "day", Seq("tier"))
    // at day 3: cust 1 is silver ([3,5)); cust 2 not yet born
    val at3 = Windows.scd2AsOf(hist, lit(3))
      .select("cust", "tier").as[(Long, String)].collect().toSet
    assert(at3 == Set((1L, "silver")))
    // at day 9: both on their open current version
    val at9 = Windows.scd2AsOf(hist, lit(9))
      .select("cust", "tier").as[(Long, String)].collect().toSet
    assert(at9 == Set((1L, "gold"), (2L, "bronze")))
    // every as-of result has exactly one row per surviving key
    assert(Windows.scd2AsOf(hist, lit(5)).groupBy("cust").count()
      .filter(col("count") > 1).isEmpty)
  }

  test("scd2Compress change detection is null-safe across tracked columns") {
    val snaps = Seq(
      (1L, 1, Option("a"), Option(10)),
      (1L, 2, None, Option(10)),        // a -> null is a change
      (1L, 3, None, Option(10)),        // null == null: no change
      (1L, 4, None, None),              // second column changes
      (1L, 5, Option("a"), None)        // first column changes back
    ).toDF("k", "day", "v1", "v2")
    val got = Windows.scd2Compress(snaps, Seq("k"), "day", Seq("v1", "v2"))
      .select("valid_from").as[Int].collect().toSeq.sorted
    assert(got == Seq(1, 2, 4, 5))
  }

  test("scd2Compress round-trips: expanding intervals reproduces the series") {
    // pseudo-random but deterministic step series per key
    val series = spark.range(40).select(
      (col("id") % 4).as("k"), (col("id") / 4).cast("long").as("day"),
      (pmod(col("id") * 2654435761L, lit(97)) < 40).cast("int").as("v"))
    val compressed = Windows.scd2Compress(series, Seq("k"), "day", Seq("v"))
    // expand each interval back to its days (bounded by the series max)
    val expanded = compressed
      .withColumn("day", explode(sequence(col("valid_from"),
        coalesce(col("valid_to") - 1, lit(9L)))))
      .select("k", "day", "v")
    val orig = series.select("k", "day", "v").as[(Long, Long, Int)].collect().toSet
    val back = expanded.as[(Long, Long, Int)].collect().toSet
    assert(back == orig)
  }

  test("gapFillForward densifies each key's span and carries values forward") {
    val daily = Seq(
      (1L, "2026-01-01", 10L), (1L, "2026-01-04", 40L), // gap of 2 days
      (2L, "2026-01-03", 30L))                          // single observation
      .toDF("k", "d", "v").withColumn("d", col("d").cast("date"))
    val got = Windows.gapFillForward(daily, "k", "d", "v")
      .select(col("k"), col("d").cast("string"), col("v"), col("observed"))
      .as[(Long, String, Long, Boolean)].collect().toSet
    assert(got == Set(
      (1L, "2026-01-01", 10L, true),
      (1L, "2026-01-02", 10L, false), // carried
      (1L, "2026-01-03", 10L, false), // carried
      (1L, "2026-01-04", 40L, true),
      (2L, "2026-01-03", 30L, true))) // span of one day, no padding
  }

  test("rollingRange: value-range frame rolls by elapsed time, ties are peers") {
    val rows = Seq(
      // key 1: days 1, 2, 9 — day 9 is outside a 7-day trail of day 2
      (1L, 1L, 10L), (1L, 2L, 20L), (1L, 9L, 40L),
      // key 2: two same-day rows are RANGE peers (both see both)
      (2L, 5L, 1L), (2L, 5L, 2L),
      // key 2: day 11 sees day 5 rows at lookback 6 (11-6=5, inclusive)
      (2L, 11L, 4L))
      .toDF("k", "day", "v")
    val got = Windows.rollingRange(rows, Seq(col("k")), col("day"), 6,
        Seq(sum(col("v")) -> "s", count(lit(1)) -> "n"))
      .select("k", "day", "v", "s", "n")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 10L, 10L, 1L), (1L, 2L, 20L, 30L, 2L), (1L, 9L, 40L, 40L, 1L),
      (2L, 5L, 1L, 3L, 2L), (2L, 5L, 2L, 3L, 2L), (2L, 11L, 4L, 7L, 3L)))
  }

  test("rollingRange agrees with a driver-side replay on random sparse series") {
    val rnd = new scala.util.Random(65)
    val rows = Seq.tabulate(500) { i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(60).toLong, (rnd.nextInt(100) + 1).toLong)
    }
    val look = 13L
    val got = Windows.rollingRange(rows.toDF("k", "day", "v"),
        Seq(col("k")), col("day"), look, Seq(sum(col("v")) -> "s"))
      .select("k", "day", "v", "s")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val expected = rows.map { case (k, d, v) =>
      val s = rows.collect { case (`k`, d2, v2) if d2 >= d - look && d2 <= d => v2 }.sum
      (k, d, v, s)
    }.sorted
    assert(got == expected)
  }

  test("rollingRange lookbacks over one key+axis share a single shuffle and sort") {
    val df = Seq.tabulate(200)(i => (i.toLong % 7, i.toLong % 40, i.toLong))
      .toDF("k", "day", "v")
    val w7 = Windows.rollingRange(df, Seq(col("k")), col("day"), 6,
      Seq(sum(col("v")) -> "s7", count(lit(1)) -> "n7"))
    val plan = Windows.rollingRange(w7, Seq(col("k")), col("day"), 29,
        Seq(sum(col("v")) -> "s30"))
      .queryExecution.executedPlan.toString
    // both frames ride one key-partitioned exchange and one sort, and
    // CollapseWindow folds every aggregate (both lookbacks included —
    // frames may differ within one operator) into a single Window pass
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(raw"\bSort \[".r.findAllIn(plan).size == 1, plan)
    assert(raw"\bWindow \[".r.findAllIn(plan).size == 1, plan)
  }

  test("rollingRange validates its arguments") {
    val df = Seq((1L, 1L, 1L)).toDF("k", "day", "v")
    intercept[IllegalArgumentException] {
      Windows.rollingRange(df, Seq(col("k")), col("day"), -1, Seq(sum(col("v")) -> "s"))
    }
    intercept[IllegalArgumentException] {
      Windows.rollingRange(df, Seq(col("k")), col("day"), 1, Seq.empty)
    }
  }
}
