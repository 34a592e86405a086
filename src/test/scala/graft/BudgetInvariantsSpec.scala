package graft

import org.apache.spark.sql.functions._

import graft.jobs.BudgetPipeline
import graft.operators.Contracts
import graft.sources.{Synthetic, Tables}

/** The reference's manual reconciliation checklist promoted to automated
  * invariants (SURVEY §5; .DevContext/Budget_Specs.md:173-204). */
class BudgetInvariantsSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val records = BudgetPipeline.records(
    Synthetic.Budget.byCategory(Tables.nation(spark, sfDir)),
    Synthetic.Budget.byGroup(Tables.region(spark, sfDir)),
    Synthetic.Budget.flex(spark),
    Synthetic.Budget.totals(spark),
    Synthetic.Budget.categoriesDim(Tables.nation(spark, sfDir)),
    Synthetic.Budget.groupsDim(Tables.region(spark, sfDir)),
    loadedAt = "2026-01-01 00:00:00").cache()

  test("column order is exactly the 31-column contract (v3:886-894)") {
    assert(records.columns.toSeq == Contracts.budgetPriority)
  }

  test("cumulative >= actual on rows with nonnegative actuals (Budget_Specs.md:190)") {
    val bad = records
      .filter(col("RecordType").isin("Category", "CategoryGroup", "FlexibleExpense"))
      .filter(col("ActualAmount") >= 0)
      .filter(col("CumulativeActualAmount") < col("ActualAmount"))
      .count()
    assert(bad == 0)
  }

  test("cumulative is monotone nondecreasing over months within an entity") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("RecordType", "CategoryId", "CategoryGroupId", "BudgetVariability")
      .orderBy("Month")
    val bad = records
      .filter(col("RecordType").isin("Category", "CategoryGroup", "FlexibleExpense"))
      .withColumn("prev", lag(col("CumulativeActualAmount"), 1).over(w))
      .filter(col("prev").isNotNull && col("CumulativeActualAmount") < col("prev"))
      .count()
    assert(bad == 0)
  }

  test("income group rows carry Credit/IsIncome, expenses Debit (Budget_Specs.md:182-184)") {
    val mismatched = records.filter(
      (col("CategoryGroupType") === "income" &&
        (col("DebitCreditFlag") =!= "Credit" || !col("IsIncome"))) ||
      (col("CategoryGroupType") === "expense" &&
        (col("DebitCreditFlag") =!= "Debit" || col("IsIncome")))).count()
    assert(mismatched == 0)
  }

  test("all 7 record types are present (U2, v3:541-869)") {
    val types = records.select("RecordType").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("Category", "CategoryGroup", "FlexibleExpense",
      "TotalIncome", "TotalExpenses", "FixedExpenses", "FlexibleExpenses", "NonMonthlyExpenses"))
  }

  test("totals rows carry no cumulative (v3:812) and correct group orders") {
    val tot = records.filter(col("RecordType").like("%Expenses") || col("RecordType") === "TotalIncome")
    assert(tot.filter(col("CumulativeActualAmount") =!= 0.0).count() == 0)
    assert(tot.filter(col("RecordType") === "TotalIncome")
      .filter(col("GroupOrder") =!= -1).count() == 0)
  }

  test("rows are sorted by (CategoryGroupName, CategoryName, Month) (v3:907-911)") {
    val keys = records.select("CategoryGroupName", "CategoryName", "Month")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(keys == keys.sorted)
  }

  test("RemainingAmount = PlannedCashFlow - ActualAmount on synthetic records") {
    val bad = records.filter(
      abs(col("RemainingAmount") - (col("PlannedCashFlow") - col("ActualAmount"))) > 1e-9).count()
    assert(bad == 0)
  }
}
