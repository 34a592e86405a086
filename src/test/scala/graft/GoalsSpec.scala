package graft

import org.apache.spark.sql.functions._

import graft.jobs.BudgetPipeline
import graft.sources.{Synthetic, Tables}

/** S3 goals fragments — the @include(if:) toggle semantics
  * (monarchmoney.py:1113-1114, 1253-1296): each Option mirrors
  * use_legacy_goals / use_v2_goals; an off toggle removes that leg entirely. */
class GoalsSpec extends SparkTestBase {

  private def nation = Tables.nation(spark, "/root/testdata/sf0.001")
  private def legacyPair =
    (Synthetic.Budget.legacyGoals(nation), Synthetic.Budget.legacyPlannedContributions(nation))

  test("both toggles off yields an empty result with the stable contract schema") {
    val out = BudgetPipeline.goalRecords(spark, legacy = None, v2 = None)
    assert(out.schema == BudgetPipeline.goalSchema)
    assert(out.count() == 0)
  }

  test("legacy-only: v2 leg absent, legacy rows carry null contribution_sum") {
    val out = BudgetPipeline.goalRecords(spark, legacy = Some(legacyPair), v2 = None)
    assert(out.select("goal_system").distinct().collect().map(_.getString(0)).toSeq == Seq("legacy"))
    assert(out.filter(col("contribution_sum").isNotNull).count() == 0)
    // one row per goal per window month
    assert(out.count() == nation.count() * Synthetic.Budget.months)
  }

  test("v2-only: planned and summary months align one row per (goal, month)") {
    val out = BudgetPipeline.goalRecords(spark, legacy = None,
      v2 = Some(Synthetic.Budget.goalsV2(nation)))
    assert(out.select("goal_system").distinct().collect().map(_.getString(0)).toSeq == Seq("v2"))
    assert(out.count() == nation.count() * Synthetic.Budget.months)
    assert(out.filter(col("planned_amount").isNull || col("contribution_sum").isNull).count() == 0)
  }

  test("v2 row-local month merge keeps a summary-only month (independent sub-selection windows)") {
    import spark.implicits._
    val g = Seq(("G1", "Goal One")).toDF("id", "name")
      .select(col("id"), col("name"),
        array(struct(lit("P1").as("id"), lit("1997-01-01").as("month"), lit(1.5).as("amount")))
          .as("plannedContributions"),
        array(
          struct(lit("1997-01-01").as("month"), lit(2.5).as("sum")),
          struct(lit("1997-02-01").as("month"), lit(3.5).as("sum")))
          .as("monthlyContributionSummaries"))
    val out = BudgetPipeline.goalRecords(spark, None, Some(g))
      .orderBy("month").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("planned_amount") == 1.5)
    assert(out(1).isNullAt(out(1).fieldIndex("planned_amount"))) // summary-only month survives
    assert(out(1).getAs[Double]("contribution_sum") == 3.5)
  }

  test("both toggles on: one leg per system, disjoint ids") {
    val out = BudgetPipeline.goalRecords(spark, Some(legacyPair),
      Some(Synthetic.Budget.goalsV2(nation)))
    assert(out.count() == 2 * nation.count() * Synthetic.Budget.months)
    val systems = out.select("goal_system").distinct().collect().map(_.getString(0)).toSet
    assert(systems == Set("legacy", "v2"))
  }
}
