package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.{GraftRules, RangeJoinRewrite}

/** The automatic range-join rewrite: fires only on the exact
  * pure-range inner-join pattern, produces the binned equi-join, and is
  * result-identical to the nested loop it replaces — including the null,
  * inverted-interval, and boundary cases the residual filter must carry. */
class RangeJoinRuleSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  private def points: DataFrame =
    Seq((1L, t("2026-01-01 10:00:00")), (2L, t("2026-01-01 10:30:00")),
      (3L, t("2026-01-01 11:00:00")), (4L, t("2026-01-02 09:59:59")),
      (5L, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("pid", "ts")

  private def intervals: DataFrame =
    Seq((9L, t("2026-01-01 10:00:00"), t("2026-01-01 11:00:00")),
      (8L, t("2026-01-02 09:00:00"), t("2026-01-02 10:00:00")),
      (7L, t("2026-01-03 12:00:00"), t("2026-01-03 11:00:00")), // inverted
      (6L, null.asInstanceOf[java.sql.Timestamp], t("2026-01-04 00:00:00")))
      .toDF("iid", "start_ts", "end_ts")

  private def naiveJoin: DataFrame =
    points.join(intervals,
      col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .select("pid", "iid")

  test("rewrites the pure range join to a bin equi-join — no nested loop") {
    GraftRules.install(spark)
    val plan = naiveJoin.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Generate"), plan) // the interval bin explode
  }

  test("result is identical to the nested loop, nulls/inversions/bounds included") {
    // ground truth with the rule OFF
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq()
    val expected = try naiveJoin.as[(Long, Long)].collect().toSet
    finally spark.experimental.extraOptimizations = saved
    GraftRules.install(spark)
    assert(expected == Set((1L, 9L), (2L, 9L), (4L, 8L))) // closed start, open end
    val got = naiveJoin.as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("narrow bins change the plan constant, never the result") {
    GraftRules.install(spark)
    spark.conf.set(RangeJoinRewrite.BinSecondsKey, "60")
    try {
      val got = naiveJoin.as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 9L), (2L, 9L), (4L, 8L)))
    } finally spark.conf.unset(RangeJoinRewrite.BinSecondsKey)
  }

  test("autoTuneBinSeconds derives the width from the data and the result is unchanged") {
    GraftRules.install(spark)
    try {
      val secs = GraftRules.autoTuneBinSeconds(spark, intervals, "start_ts", "end_ts")
      // valid interval lengths here are exactly one hour; the p90 of the
      // histogram walk rounds up by at most one bucket (~width/1000)
      assert(secs >= 3600L && secs <= 3700L, s"derived $secs s")
      assert(spark.conf.get(RangeJoinRewrite.BinSecondsKey) == secs.toString)
      val got = naiveJoin.as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 9L), (2L, 9L), (4L, 8L)))
    } finally spark.conf.unset(RangeJoinRewrite.BinSecondsKey)
  }

  test("does not fire on equi-joins, outer range joins, or hinted joins") {
    GraftRules.install(spark)
    // equi + range residual: already a hash join, pattern must not match
    val equi = points.withColumn("k", lit(1))
      .join(intervals.withColumn("k", lit(1)),
        Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!equi.contains("_graft_bin"), equi)
    // LEFT join with the range condition: out of scope, left alone
    val outer = points.join(intervals,
        col("ts") >= col("start_ts") && col("ts") < col("end_ts"), "left")
      .queryExecution.optimizedPlan.toString
    assert(!outer.contains("_graft_bin"), outer)
    // broadcast-hinted: the hint wins
    val hinted = points.join(broadcast(intervals),
        col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .queryExecution.optimizedPlan.toString
    assert(!hinted.contains("_graft_bin"), hinted)
  }

  test("agrees with the hand-built RangeJoin operator on random data") {
    GraftRules.install(spark)
    val p = spark.range(400).select(col("id").as("pid"),
      timestamp_micros(pmod(col("id") * 2654435761L, lit(86400000000L))).as("ts"))
    val i = spark.range(150).select(col("id").as("iid"),
      timestamp_micros(pmod(col("id") * 40503L, lit(86400000000L))).as("start_ts"))
      .withColumn("end_ts", timestamp_micros(
        unix_micros(col("start_ts")) + pmod(col("iid") * 7L, lit(5L)) * 1800000000L))
    val auto = p.join(i, col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val hand = graft.operators.RangeJoin.pointInInterval(
        p, "ts", i, "start_ts", "end_ts", binMicros = 3600000000L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(auto == hand && auto.nonEmpty)
  }
}
