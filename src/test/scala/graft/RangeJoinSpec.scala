package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Binned range join: equals the nested-loop result, half-open boundaries,
  * and the physical plan must be an equi-join, not a nested loop. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private lazy val points = (0 until 200).map(i =>
    (i.toLong, t(f"2026-01-01 ${i % 24}%02d:${(i * 7) % 60}%02d:30"))).toDF("pid", "ts")
  private lazy val intervals = (0 until 40).map(j =>
    (j.toLong, t(f"2026-01-01 ${(j * 3) % 24}%02d:00:00"),
      t(f"2026-01-01 ${(j * 3) % 24}%02d:${30 + j % 30}%02d:00"))).toDF("iid", "start_ts", "end_ts")

  test("matches the naive nested-loop result across bin widths") {
    val naive = points.crossJoin(intervals)
      .filter(col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty)
    for (binUs <- Seq(60000000L, 600000000L, 3600000000L)) {
      val got = RangeJoin.pointInInterval(points, "ts", intervals, "start_ts", "end_ts", binUs)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == naive, s"bin=$binUs")
    }
  }

  test("boundaries are half-open: start included, end excluded") {
    val p = Seq((1L, t("2026-01-01 10:00:00")), (2L, t("2026-01-01 11:00:00")))
      .toDF("pid", "ts")
    val i = Seq((9L, t("2026-01-01 10:00:00"), t("2026-01-01 11:00:00")))
      .toDF("iid", "start_ts", "end_ts")
    val got = RangeJoin.pointInInterval(p, "ts", i, "start_ts", "end_ts", 3600000000L)
      .select("pid").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("plans as an equi-join on the bin, never a nested loop or cartesian") {
    val plan = RangeJoin.pointInInterval(points, "ts", intervals, "start_ts", "end_ts",
      3600000000L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  // deterministic pseudo-random closed intervals: starts from a hash grid,
  // lengths spanning zero-length through many-bin
  private def randIntervals(n: Int, idName: String, sName: String, eName: String) = {
    spark.range(n).select(col("id").as(idName),
      (pmod(col("id") * 2654435761L, lit(100000L)) * 1000L).as(sName))
      .withColumn(eName,
        col(sName) + pmod(col(idName) * 40503L, lit(40L)) * lit(700000L))
  }

  test("intervalOverlap equals the naive overlap join, each pair exactly once") {
    val a = randIntervals(300, "aid", "a_s", "a_e")
    val b = randIntervals(200, "bid", "b_s", "b_e")
      .withColumn("b_s", col("b_s") + 350000L) // misalign so touching cases vary
      .withColumn("b_e", col("b_e") + 350000L)
    val naive = a.crossJoin(b)
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("aid", "bid").as[(Long, Long)].collect()
    assert(naive.nonEmpty && naive.length == naive.toSet.size)
    for (binUs <- Seq(500000L, 5000000L, 50000000L)) {
      val got = RangeJoin.intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e", binUs)
        .select("aid", "bid").as[(Long, Long)].collect()
      // exactly once: the canonical-bin filter replaces a distinct
      assert(got.length == got.toSet.size, s"bin=$binUs emitted duplicates")
      assert(got.toSet == naive.toSet, s"bin=$binUs")
    }
  }

  test("intervalOverlap endpoints are closed; zero-length intervals still match") {
    val a = Seq((1L, 1000L, 1000L)).toDF("aid", "a_s", "a_e") // a point interval
    val b = Seq((9L, 500L, 1000L), (8L, 1000L, 2000L), (7L, 1001L, 2000L))
      .toDF("bid", "b_s", "b_e")
    val got = RangeJoin.intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e", 700L)
      .select("bid").as[Long].collect().toSet
    assert(got == Set(9L, 8L)) // touching at either end matches; 7L starts after
  }

  test("intervalOverlap plans as a bin equi-join, never a nested loop") {
    val a = randIntervals(50, "aid", "a_s", "a_e")
    val b = randIntervals(50, "bid", "b_s", "b_e")
    val plan = RangeJoin.intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e", 1000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }
}
