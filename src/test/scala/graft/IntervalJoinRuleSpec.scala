package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.{GraftRules, RangeJoinRewrite}

/** The automatic interval-overlap rewrite: fires only on the exact
  * two-sided `<=` overlap pattern over long endpoints, produces the binned
  * equi-join with the canonical-bin uniqueness filter, and is
  * result-identical to the nested loop — including null endpoints,
  * inverted intervals, boundary touches, and multi-bin spans (where
  * exactly-once emission is the part a naive binned join gets wrong). */
class IntervalJoinRuleSpec extends SparkTestBase {
  import spark.implicits._

  private val H = 3600000000L // one bin at the default 3600 s width

  private def aSide: DataFrame =
    Seq[(Long, Option[Long], Option[Long])](
      (1L, Some(0L), Some(H / 2)),       // half-bin interval
      (2L, Some(H / 2), Some(5 * H)),    // spans six bins
      (3L, Some(10 * H), Some(9 * H)),   // inverted (start > end)
      (4L, Some(20 * H), None),          // null end
      (5L, Some(7 * H), Some(7 * H)))    // degenerate point
      .toDF("aid", "a_start", "a_end")

  private def bSide: DataFrame =
    Seq((11L, Some(0L), Some(H / 4)),          // overlaps a1 at the low end
      (12L, Some(3 * H), Some(12 * H)),        // overlaps a2, a3, a5
      (13L, Some(H / 2), Some(H / 2)),         // boundary touch with a1 and a2
      (14L, None: Option[Long], Some(50L * H)) // null start
    ).toDF("bid", "b_start", "b_end")

  private def naive: DataFrame =
    aSide.join(bSide,
      col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select("aid", "bid")

  test("rewrites the overlap join to a bin equi-join — no nested loop") {
    GraftRules.install(spark)
    val plan = naive.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Generate"), plan)
  }

  test("result matches the nested loop exactly — each pair exactly once") {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq()
    val expected = try naive.as[(Long, Long)].collect().toSeq.sorted
    finally spark.experimental.extraOptimizations = saved
    GraftRules.install(spark)
    val got = naive.as[(Long, Long)].collect().toSeq.sorted
    // multiset equality: a duplicate emission (the multi-bin a2×b12 pair
    // shares bins 3..5) would show as a repeated pair here
    assert(got == expected, s"got $got expected $expected")
    // sanity on the ground truth itself: a2×b12 present once; inverted a3
    // matches b12 (10H <= 12H and 3H <= 9H); nulls match nothing
    assert(expected.count(_ == ((2L, 12L))) == 1)
    assert(expected.contains((3L, 12L)))
    assert(!expected.exists { case (a, b) => a == 4L || b == 14L })
  }

  test("boundary touches survive and bin width never changes the result") {
    GraftRules.install(spark)
    val base = naive.as[(Long, Long)].collect().toSet
    assert(base.contains((1L, 13L)) && base.contains((2L, 13L)))
    spark.conf.set(RangeJoinRewrite.BinSecondsKey, "60")
    try assert(naive.as[(Long, Long)].collect().toSet == base)
    finally spark.conf.unset(RangeJoinRewrite.BinSecondsKey)
  }

  test("does not fire on conditions that are not the overlap pattern") {
    GraftRules.install(spark)
    // same-side comparison: not a cross-side overlap
    val sameSide = aSide.join(bSide,
      col("a_start") <= col("a_end") && col("b_start") <= col("b_end"))
    val plan = sameSide.queryExecution.optimizedPlan.toString
    assert(!plan.contains("_graft_ibin"), plan)
    // extra equality key: plans as a hash join, pattern never reached
    val keyed = aSide.withColumn("k", col("aid") % 2)
      .join(bSide.withColumn("k", col("bid") % 2),
        Seq("k"), "inner")
    assert(!keyed.queryExecution.optimizedPlan.toString.contains("_graft_ibin"))
  }
}
