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
}
