package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

import graft.operators.{Contracts, Windows}

/** The reference's budget denormalization (MonarchMoneyMain-v3.py:536-876):
  * explode each monthlyAmounts series, join the category/group dims with `{}`
  * defaults (J3/J4 over the J2-denormalized category dim), derive
  * DebitCreditFlag/IsIncome (F12), unpivot the five per-month totals buckets
  * (A5), union the 7 record shapes (U2), compute the CumulativeActualAmount
  * running total (A6 — the API carries it denormalized; Spark recomputes it
  * as a window), and project the pinned 31-column contract with the 3-key
  * sort (v3:878-914).
  *
  * Scale: explodes and flag derivations are row-local; the dim joins
  * broadcast (category dims are never data-scale); the A6 window runs once
  * per record type on that type's own entity key (three small exchanges —
  * budget record sets are months x entities, never data-scale); the union
  * itself is shuffle-free.
  */
object BudgetPipeline {

  private def s(c: Column): Column = coalesce(c.cast("string"), lit(""))
  private def d(c: Column): Column = coalesce(c.cast("double"), lit(0.0)) // F13
  private def b(c: Column): Column = coalesce(c, lit(false))

  /** F12 — income group => (Credit, true) else (Debit, false) (v3:588-590). */
  private def flags(groupType: Column): Seq[Column] = Seq(
    when(groupType === "income", "Credit").otherwise("Debit").as("DebitCreditFlag"),
    (groupType === "income").as("IsIncome"))

  private def rollover(rp: Column): Seq[Column] = Seq(
    s(rp.getField("id")).as("RolloverPeriodId"),
    s(rp.getField("startMonth")).as("RolloverStartMonth"),
    s(rp.getField("endMonth")).as("RolloverEndMonth"),
    d(rp.getField("startingBalance")).as("RolloverStartingBalance"),
    d(rp.getField("targetAmount")).as("RolloverTargetAmount"),
    s(rp.getField("frequency")).as("RolloverFrequency"))

  private val emptyRollover: Seq[Column] = Seq(
    lit("").as("RolloverPeriodId"), lit("").as("RolloverStartMonth"),
    lit("").as("RolloverEndMonth"), lit(0.0).as("RolloverStartingBalance"),
    lit(0.0).as("RolloverTargetAmount"), lit("").as("RolloverFrequency"))

  private def monthly(m: Column, setAside: Option[Column]): Seq[Column] = Seq(
    s(m.getField("month")).as("Month"),
    d(m.getField("plannedCashFlowAmount")).as("PlannedCashFlow"),
    setAside.map(d).getOrElse(lit(0.0)).as("PlannedSetAside"),
    d(m.getField("actualAmount")).as("ActualAmount"),
    d(m.getField("remainingAmount")).as("RemainingAmount"),
    d(m.getField("previousMonthRolloverAmount")).as("RolloverAmount"),
    s(m.getField("rolloverType")).as("RolloverType"))

  /** A6 — CumulativeActualAmount: running ActualAmount per entity over months
    * (Budget_Specs.md:99 — invariant: cumulative >= actual when actuals are
    * nonnegative). */
  private def cumulative(df: DataFrame, key: Column): DataFrame =
    Windows.runningTotal(df, Seq(col("RecordType"), key), Seq(col("Month")),
      col("ActualAmount"), "CumulativeActualAmount")

  /** Category-level records (v3:597-627). `categoriesDim` carries its parent
    * groupId; the J2 group join denormalizes group attributes first. */
  def categoryRecords(byCategory: DataFrame, categoriesDim: DataFrame,
                      groupsDim: DataFrame): DataFrame = {
    val dim = categoriesDim.alias("c")
      .join(broadcast(groupsDim.alias("g")), col("c.groupId") === col("g.id"), "left")
      .select(
        col("c.id").as("_cid"), col("c.name").as("_cname"), col("c.icon").as("_icon"),
        col("c.isSystemCategory").as("_sys"), col("c.excludeFromBudget").as("_excl"),
        col("c.updatedAt").as("_upd"), col("c.budgetVariability").as("_var"),
        col("c.order").as("_corder"), col("c.rolloverPeriod").as("_rp"),
        col("g.id").as("_gid"), col("g.name").as("_gname"), col("g.type").as("_gtype"),
        col("g.order").as("_gorder"))
    val exploded = byCategory.select(
      col("category.id").as("_fid"), explode(col("monthlyAmounts")).as("m"))
    // J3: fact -> dim with {} defaults for unknown categories (v3:583-585)
    val joined = exploded.join(broadcast(dim), col("_fid") === col("_cid"), "left")
    val gtype = s(col("_gtype"))
    val rec = joined.select(Seq(
      lit("Category").as("RecordType"),
      s(col("_gid")).as("CategoryGroupId"),
      s(col("_gname")).as("CategoryGroupName"),
      gtype.as("CategoryGroupType")) ++
      flags(gtype) ++ Seq(
      s(col("_fid")).as("CategoryId"),
      s(col("_cname")).as("CategoryName"),
      s(col("_icon")).as("CategoryIcon"),
      b(col("_sys")).as("IsSystemCategory"),
      b(col("_excl")).as("ExcludeFromBudget"),
      s(col("_upd")).as("CategoryUpdatedAt")) ++
      monthly(col("m"), Some(col("m").getField("plannedSetAsideAmount"))) ++
      rollover(col("_rp")) ++ Seq(
      s(col("_var")).as("BudgetVariability"),
      coalesce(col("_corder"), lit(0)).as("CategoryOrder"),
      coalesce(col("_gorder"), lit(0)).as("GroupOrder")): _*)
    cumulative(rec, col("CategoryId"))
  }

  /** Group-level records (v3:655-686). */
  def groupRecords(byGroup: DataFrame, groupsDim: DataFrame): DataFrame = {
    val exploded = byGroup.select(
      col("categoryGroup.id").as("_fid"), explode(col("monthlyAmounts")).as("m"))
    // J4: fact -> group dim with {} defaults (v3:642-643)
    val joined = exploded.join(broadcast(groupsDim.alias("g")),
      col("_fid") === col("g.id"), "left")
    val gtype = s(col("g.type"))
    val rec = joined.select(Seq(
      lit("CategoryGroup").as("RecordType"),
      s(col("_fid")).as("CategoryGroupId"),
      s(col("g.name")).as("CategoryGroupName"),
      gtype.as("CategoryGroupType")) ++
      flags(gtype) ++ Seq(
      lit("").as("CategoryId"), lit("").as("CategoryName"), lit("").as("CategoryIcon"),
      lit(false).as("IsSystemCategory"), lit(false).as("ExcludeFromBudget"),
      lit("").as("CategoryUpdatedAt"),
      b(col("g.groupLevelBudgetingEnabled")).as("GroupLevelBudgetingEnabled")) ++
      monthly(col("m"), None) ++
      emptyRollover ++ Seq(
      s(col("g.budgetVariability")).as("BudgetVariability"),
      lit(0).as("CategoryOrder"),
      coalesce(col("g.order"), lit(0)).as("GroupOrder")): _*)
    cumulative(rec, col("CategoryGroupId"))
  }

  /** Flexible-expense records (v3:705-737): fixed group attributes,
    * GroupOrder 999. */
  def flexRecords(flex: DataFrame): DataFrame = {
    val exploded = flex.select(
      col("budgetVariability").as("_var"), explode(col("monthlyAmounts")).as("m"))
    val rec = exploded.select(Seq(
      lit("FlexibleExpense").as("RecordType"),
      lit("").as("CategoryGroupId"),
      lit("Flexible Expenses").as("CategoryGroupName"),
      lit("expense").as("CategoryGroupType"),
      lit("Debit").as("DebitCreditFlag"),
      lit(false).as("IsIncome"),
      lit("").as("CategoryId"), lit("").as("CategoryName"), lit("").as("CategoryIcon"),
      lit(false).as("IsSystemCategory"), lit(false).as("ExcludeFromBudget"),
      lit("").as("CategoryUpdatedAt"),
      lit(false).as("GroupLevelBudgetingEnabled")) ++
      monthly(col("m"), None) ++
      emptyRollover ++ Seq(
      s(col("_var")).as("BudgetVariability"),
      lit(0).as("CategoryOrder"),
      lit(999).as("GroupOrder")): _*)
    cumulative(rec, col("BudgetVariability"))
  }

  /** A5 — totalsByMonth unpivot: 5 records per month, GroupOrder -1 for
    * income / 998 for the four expense buckets (v3:790-869). */
  def totalsRecords(totals: DataFrame): DataFrame = {
    def slot(rt: String, bucket: String, gname: String, gtype: String,
             cname: String, gorder: Int): Column =
      struct(lit(rt).as("rt"), lit(gname).as("gname"), lit(gtype).as("gtype"),
        lit(cname).as("cname"), lit(gorder).as("gorder"), col(bucket).as("b"))
    val slots = array(
      slot("TotalIncome", "totalIncome", "Income", "income", "Total Income", -1),
      slot("TotalExpenses", "totalExpenses", "Expenses", "expense", "Total Expenses", 998),
      slot("FixedExpenses", "totalFixedExpenses", "Expenses", "expense", "Fixed Expenses", 998),
      slot("FlexibleExpenses", "totalFlexibleExpenses", "Expenses", "expense", "Flexible Expenses", 998),
      slot("NonMonthlyExpenses", "totalNonMonthlyExpenses", "Expenses", "expense", "Non-Monthly Expenses", 998))
    val exploded = totals.select(col("month").as("_month"), explode(slots).as("t"))
    val bkt = col("t").getField("b")
    exploded.select((Seq(
      col("t").getField("rt").as("RecordType"),
      lit("").as("CategoryGroupId"),
      col("t").getField("gname").as("CategoryGroupName"),
      col("t").getField("gtype").as("CategoryGroupType")) ++
      flags(col("t").getField("gtype")) ++ Seq(
      lit("").as("CategoryId"),
      col("t").getField("cname").as("CategoryName"),
      lit("").as("CategoryIcon"),
      lit(true).as("IsSystemCategory"),
      lit(false).as("ExcludeFromBudget"),
      lit("").as("CategoryUpdatedAt"),
      lit(false).as("GroupLevelBudgetingEnabled"),
      s(col("_month")).as("Month"),
      d(bkt.getField("plannedAmount")).as("PlannedCashFlow"),
      lit(0.0).as("PlannedSetAside"),
      d(bkt.getField("actualAmount")).as("ActualAmount"),
      lit(0.0).as("CumulativeActualAmount"), // totals carry no cumulative (v3:812)
      d(bkt.getField("remainingAmount")).as("RemainingAmount"),
      d(bkt.getField("previousMonthRolloverAmount")).as("RolloverAmount"),
      lit("").as("RolloverType"))) ++
      emptyRollover ++ Seq(
      lit("").as("BudgetVariability"),
      lit(0).as("CategoryOrder"),
      col("t").getField("gorder").as("GroupOrder")): _*)
  }

  /** Output contract of [[goalRecords]] — stable even when every fragment
    * toggle is off. */
  val goalSchema: StructType = StructType(Seq(
    StructField("goal_system", StringType, nullable = false),
    StructField("goal_id", StringType),
    StructField("goal_name", StringType),
    StructField("month", StringType),
    StructField("planned_amount", DoubleType),
    StructField("contribution_sum", DoubleType)))

  /** The budget response's goal fragments (monarchmoney.py:1253-1296),
    * unified to long-form (goal, month) contribution rows. Each `Option`
    * mirrors a GraphQL `@include(if:)` toggle (`use_legacy_goals` /
    * `use_v2_goals`, monarchmoney.py:1113-1114): `None` means the fragment
    * was not selected and its leg contributes nothing; both off yields an
    * empty result with the same schema.
    *
    *  - legacy = (goals dim, goalPlannedContributions): planned amounts
    *    joined to the goal dim for the name (broadcast — goals are a
    *    user-scale dim, never data-scale);
    *  - v2 = goalsV2: the two nested series (plannedContributions,
    *    monthlyContributionSummaries) live on the SAME goal row, so their
    *    month-level full-outer merge is row-local: union of month keys,
    *    map lookups for each side — zero shuffle, no join. The selections
    *    carry independent month windows, so neither side may be dropped
    *    (a month present in only one series keeps a null for the other). */
  def goalRecords(spark: SparkSession,
                  legacy: Option[(DataFrame, DataFrame)],
                  v2: Option[DataFrame]): DataFrame = {
    val legacyLeg = legacy.map { case (goals, planned) =>
      planned
        .select(col("goal.id").as("goal_id"), col("startDate").as("month"),
          col("amount").as("planned_amount"))
        .join(broadcast(goals.select(col("id").as("goal_id"), col("name"))),
          Seq("goal_id"), "left")
        .select(lit("legacy").as("goal_system"), col("goal_id"),
          col("name").as("goal_name"), col("month"), col("planned_amount"),
          lit(null).cast("double").as("contribution_sum"))
    }
    val v2Leg = v2.map { g =>
      val plannedByMonth = map_from_entries(transform(col("plannedContributions"),
        p => struct(p.getField("month"), p.getField("amount"))))
      val sumByMonth = map_from_entries(transform(col("monthlyContributionSummaries"),
        s => struct(s.getField("month"), s.getField("sum"))))
      val monthKeys = array_distinct(concat(
        transform(col("plannedContributions"), _.getField("month")),
        transform(col("monthlyContributionSummaries"), _.getField("month"))))
      g.select(col("id").as("goal_id"), col("name").as("goal_name"),
          plannedByMonth.as("_pm"), sumByMonth.as("_sm"),
          explode(monthKeys).as("month")) // a goal with no months in window emits no rows
        .select(lit("v2").as("goal_system"), col("goal_id"), col("goal_name"),
          col("month"),
          element_at(col("_pm"), col("month")).as("planned_amount"),
          element_at(col("_sm"), col("month")).as("contribution_sum"))
    }
    (legacyLeg.toSeq ++ v2Leg.toSeq)
      .reduceOption(_.unionByName(_))
      .getOrElse(spark.createDataFrame(
        java.util.Collections.emptyList[Row](), goalSchema))
  }

  /** U2 — union of the 7 record shapes (Category records have no
    * GroupLevelBudgetingEnabled key in the reference; unionByName leaves it
    * null there, mirroring the union-of-keys header logic v3:165-176), then
    * the F14 batch stamp and the 31-column contract + 3-key sort. */
  def records(byCategory: DataFrame, byGroup: DataFrame, flex: DataFrame,
              totals: DataFrame, categoriesDim: DataFrame, groupsDim: DataFrame,
              loadedAt: String): DataFrame = {
    val all = categoryRecords(byCategory, categoriesDim, groupsDim)
      .unionByName(groupRecords(byGroup, groupsDim), allowMissingColumns = true)
      .unionByName(flexRecords(flex), allowMissingColumns = true)
      .unionByName(totalsRecords(totals), allowMissingColumns = true)
    Contracts.budgets(all.withColumn("LoadedAtUtc", lit(loadedAt)))
  }
}
