package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Monarch-shaped nested DataFrames derived from the TPC-H-ish
  * testdata tables (TESTDATA.md). The entity pipelines (flatten, budget
  * explode/join/union, sync merge) need nested inputs shaped like the
  * reference's API responses (FIXTURES.md §1/§2/§6); building them as pure
  * column expressions over the shared parquet tables keeps every pipeline
  * DuckDB-oracle-checkable — the oracle recomputes the same values from the
  * same tables without ever seeing the nested form.
  *
  * Everything is a row-local projection (plus one dim join) — no extra
  * shuffle beyond what the consuming pipeline does.
  */
object Synthetic {

  /** Transactions shaped like `.mm/last_txn_probe.json` results
    * (monarchmoney.py:1459-1506), derived from `orders`:
    *  - money amounts arrive as sheet-style strings (`$x.xx` / `($x.xx)`) so
    *    the pipeline's F1 scrub is load-bearing;
    *  - `account.displayName` is null for even custkeys so the J1 account
    *    name lookup join is observable in the output;
    *  - `merchant.transactionsCount` is left null — the pipeline computes the
    *    denormalized count (A7) itself;
    *  - tags cycle through 2/1/0/null so TagsCSL + JSON serialization hit
    *    every branch.
    */
  def nestedTransactions(orders: DataFrame): DataFrame = {
    val k = col("o_orderkey")
    val moneyBase = round(col("o_totalprice"), 2).cast("string")
    val moneyStr = when(pmod(k, lit(3)) === 0, concat(lit("($"), moneyBase, lit(")")))
      .otherwise(concat(lit("$"), moneyBase))
    val catName = when(col("o_orderstatus") === "O", "Open")
      .when(col("o_orderstatus") === "F", "Filled")
      .otherwise("Pending")
    val tag1 = struct(concat(lit("prio:"), trim(col("o_orderpriority"))).as("name"))
    val tag2 = struct(lit("bulk").as("name"))
    val mid = pmod(col("o_custkey"), lit(100))
    orders.select(
      k.cast("string").as("id"),
      moneyStr.as("amount"),
      col("o_orderdate").cast("date").as("date"),
      (pmod(k, lit(97)) === 0).as("pending"),
      lower(trim(col("o_orderpriority"))).as("notes"),
      struct(
        col("o_custkey").cast("string").as("id"),
        when(pmod(col("o_custkey"), lit(2)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("ACCT-"), col("o_custkey"))).as("displayName"),
        lit("Account").as("__typename")).as("account"),
      struct(
        col("o_orderstatus").as("id"),
        catName.as("name"),
        lit("Category").as("__typename")).as("category"),
      struct(
        concat(lit("M"), mid).as("id"),
        concat(lit("Merchant "), mid).as("name"),
        lit(null).cast("long").as("transactionsCount"),
        lit("Merchant").as("__typename")).as("merchant"),
      when(pmod(k, lit(4)) === 0, array(tag1, tag2))
        .when(pmod(k, lit(4)) === 1, array(tag1))
        .when(pmod(k, lit(4)) === 2, array().cast("array<struct<name:string>>"))
        .otherwise(lit(null).cast("array<struct<name:string>>")).as("tags"),
      col("o_orderdate").cast("timestamp").as("createdAt"),
      (col("o_orderdate").cast("timestamp") +
        make_interval(hours = pmod(k, lit(49)).cast("int"))).as("updatedAt"),
      lit("Transaction").as("__typename"))
  }

  private def make_interval(hours: Column): Column =
    call_function("make_interval", lit(0), lit(0), lit(0), lit(0), hours, lit(0), lit(0))

  /** Accounts dim for the J1 lookup (customer as the account dimension). */
  def accountsDim(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey").cast("string").as("id"),
      col("c_name").as("displayName"))

  /** Accounts shaped like `tests/get_accounts.json` (monarchmoney.py:148-206),
    * derived from `customer` x `nation`: type/subtype/institution structs for
    * the F8 flatten and the account column contract. */
  def nestedAccounts(customer: DataFrame, nation: DataFrame): DataFrame = {
    val seg = col("c_mktsegment")
    val sub = pmod(col("c_nationkey"), lit(4))
    customer.join(nation, col("c_nationkey") === col("n_nationkey"))
      .select(
        col("c_custkey").cast("string").as("id"),
        col("c_name").as("displayName"),
        lpad(pmod(col("c_custkey"), lit(10000)).cast("string"), 4, "0").as("mask"),
        (col("c_acctbal") >= 0).as("isAsset"),
        col("c_acctbal").as("currentBalance"),
        col("c_acctbal").as("displayBalance"),
        (col("c_custkey") % 100).cast("int").as("order"),
        (col("c_custkey") % 50).cast("int").as("transactionsCount"),
        struct(
          lower(seg).as("name"),
          concat(upper(substring(seg, 1, 1)), lower(expr("substring(c_mktsegment, 2)"))).as("display"),
          lit("AccountType").as("__typename")).as("type"),
        struct(
          when(sub === 0, "checking").when(sub === 1, "savings")
            .when(sub === 2, "roth_ira").otherwise("brokerage").as("name"),
          when(sub === 0, "Checking").when(sub === 1, "Savings")
            .when(sub === 2, "Roth IRA").otherwise("Brokerage").as("display"),
          lit("AccountSubtype").as("__typename")).as("subtype"),
        struct(
          col("n_nationkey").cast("string").as("id"),
          col("n_name").as("name")).as("institution"),
        lit("Account").as("__typename"))
  }

  /** Budget response shaped like monarchmoney.py:1134-1296 (FIXTURES.md §6),
    * derived from `nation` (categories) and `region` (category groups) with a
    * fixed 6-month window. Amount formulas use exact binary fractions
    * (.25/.5/.75) so Spark and the DuckDB oracle agree bit-for-bit.
    */
  object Budget {
    val months = 6
    /** month index (0-based) -> 'YYYY-MM-01' key (v3:609). */
    def monthKey(m: Column): Column =
      concat(lit("1997-"), lpad((m + 1).cast("string"), 2, "0"), lit("-01"))

    private def monthlyAmounts(planned: Column => Column, setAside: Column => Column,
                               actual: Column => Column, rollover: Column => Column,
                               rolloverType: Column => Column): Column =
      transform(sequence(lit(0), lit(months - 1)), m => struct(
        monthKey(m).as("month"),
        planned(m).as("plannedCashFlowAmount"),
        setAside(m).as("plannedSetAsideAmount"),
        actual(m).as("actualAmount"),
        (planned(m) - actual(m)).as("remainingAmount"),
        rollover(m).as("previousMonthRolloverAmount"),
        rolloverType(m).as("rolloverType")))

    /** monthlyAmountsByCategory: one element per nation. */
    def byCategory(nation: DataFrame): DataFrame = {
      val n = col("n_nationkey")
      nation.select(
        struct(concat(lit("C"), n).as("id")).as("category"),
        monthlyAmounts(
          m => n * 10 + m + 0.25,
          m => pmod(n + m, lit(3)) + 0.5,
          m => n * 7 + m * 2 + 0.5,
          m => pmod(n + m, lit(4)) + 0.75,
          m => when(pmod(n, lit(5)) === 0, "monthly").otherwise("")).as("monthlyAmounts"))
    }

    /** monthlyAmountsByCategoryGroup: one element per region. */
    def byGroup(region: DataFrame): DataFrame = {
      val g = col("r_regionkey")
      region.select(
        struct(concat(lit("G"), g).as("id")).as("categoryGroup"),
        monthlyAmounts(
          m => g * 100 + m + 0.25,
          m => lit(0.0),
          m => g * 80 + m * 3 + 0.5,
          m => pmod(g + m, lit(3)) + 0.25,
          m => lit("")).as("monthlyAmounts"))
    }

    /** monthlyAmountsForFlexExpense: a single flexible-expense series.
      * `budgetVariability` is derived from the row id rather than emitted as
      * a literal: real API data carries it as a genuine column, and a
      * foldable key here would let Catalyst (EliminateWindowPartitions)
      * erase the consumer's A6 window partition spec and collapse the
      * running total to a single partition. */
    def flex(spark: SparkSession): DataFrame =
      spark.range(1).select(
        when(pmod(col("id"), lit(2)) === 0, "flexible").otherwise("non_monthly")
          .as("budgetVariability"),
        monthlyAmounts(
          m => m + 500.25,
          m => lit(0.0),
          m => m * 2 + 400.5,
          m => lit(0.0),
          m => lit("")).as("monthlyAmounts"))

    /** totalsByMonth: five pre-aggregated buckets per month (lib:1182-1220). */
    def totals(spark: SparkSession): DataFrame = {
      def bucket(planned: Column, actual: Column, rollover: Column): Column =
        struct(planned.as("plannedAmount"), actual.as("actualAmount"),
          (planned - actual).as("remainingAmount"),
          rollover.as("previousMonthRolloverAmount"))
      spark.range(months).select(
        monthKey(col("id")).as("month"),
        bucket(col("id") + 1000.25, col("id") * 2 + 900.5, lit(0.0)).as("totalIncome"),
        bucket(col("id") + 800.25, col("id") * 3 + 700.5, lit(1.5)).as("totalExpenses"),
        bucket(col("id") + 300.25, col("id") + 250.5, lit(0.0)).as("totalFixedExpenses"),
        bucket(col("id") + 100.25, col("id") + 90.5, lit(0.25)).as("totalNonMonthlyExpenses"),
        bucket(col("id") + 400.25, col("id") * 2 + 350.5, lit(0.0)).as("totalFlexibleExpenses"))
    }

    /** goals @include(if: $useLegacyGoals) (monarchmoney.py:1253-1258):
      * flat legacy goal dim. */
    def legacyGoals(nation: DataFrame): DataFrame = {
      val n = col("n_nationkey")
      nation.select(
        concat(lit("LG"), n).as("id"),
        concat(lit("Goal "), col("n_name")).as("name"),
        when(pmod(n, lit(4)) === 0, "1997-06-15").as("completedAt"),
        lit("1997-12-31").as("targetDate"))
    }

    /** goalPlannedContributions @include(if: $useLegacyGoals)
      * (monarchmoney.py:1269-1276): {id, amount, startDate, goal{id}} rows,
      * one per goal per window month. */
    def legacyPlannedContributions(nation: DataFrame): DataFrame = {
      val n = col("n_nationkey")
      nation
        .select(n, explode(transform(sequence(lit(0), lit(months - 1)), m => struct(
          concat(lit("GPC"), n, lit("-"), m).as("id"),
          (n * 2 + m + 0.25).as("amount"),
          monthKey(m).as("startDate")))).as("c"))
        .select(
          col("c.id").as("id"),
          col("c.amount").as("amount"),
          col("c.startDate").as("startDate"),
          struct(concat(lit("LG"), n).as("id")).as("goal"))
    }

    /** goalsV2 @include(if: $useV2Goals) (monarchmoney.py:1278-1296): goal
      * dim with nested plannedContributions and monthlyContributionSummaries
      * series over the window. */
    def goalsV2(nation: DataFrame): DataFrame = {
      val n = col("n_nationkey")
      nation.select(
        concat(lit("G2-"), n).as("id"),
        concat(lit("Goal "), col("n_name")).as("name"),
        when(pmod(n, lit(5)) === 0, "1997-03-01").as("archivedAt"),
        when(pmod(n, lit(4)) === 0, "1997-06-15").as("completedAt"),
        n.cast("int").as("priority"),
        transform(sequence(lit(0), lit(months - 1)), m => struct(
          concat(lit("PC"), n, lit("-"), m).as("id"),
          monthKey(m).as("month"),
          (n * 3 + m + 0.5).as("amount"))).as("plannedContributions"),
        transform(sequence(lit(0), lit(months - 1)), m => struct(
          monthKey(m).as("month"),
          (n + m * 2 + 0.25).as("sum"))).as("monthlyContributionSummaries"))
    }

    /** categoryGroups dim (region): id/name/type/order + variability. */
    def groupsDim(region: DataFrame): DataFrame = {
      val g = col("r_regionkey")
      region.select(
        concat(lit("G"), g).as("id"),
        col("r_name").as("name"),
        when(pmod(g, lit(2)) === 0, "income").otherwise("expense").as("type"),
        g.cast("int").as("order"),
        when(pmod(g, lit(2)) === 0, "fixed").otherwise("flexible").as("budgetVariability"),
        (pmod(g, lit(2)) === 0).as("groupLevelBudgetingEnabled"))
    }

    /** categories dim (nation), carrying the parent group id for the J2
      * denormalization; nations divisible by 5 get a rolloverPeriod. */
    def categoriesDim(nation: DataFrame): DataFrame = {
      val n = col("n_nationkey")
      val v = pmod(n, lit(3))
      nation.select(
        concat(lit("C"), n).as("id"),
        col("n_name").as("name"),
        concat(lit("G"), col("n_regionkey")).as("groupId"),
        n.cast("int").as("order"),
        lit("").as("icon"),
        (pmod(n, lit(7)) === 0).as("isSystemCategory"),
        lit(false).as("excludeFromBudget"),
        lit("").as("updatedAt"),
        when(v === 0, "fixed").when(v === 1, "flexible").otherwise("non_monthly")
          .as("budgetVariability"),
        when(pmod(n, lit(5)) === 0, struct(
          concat(lit("RP"), n).as("id"),
          lit("1997-01").as("startMonth"),
          lit("1997-12").as("endMonth"),
          (n * 10 + 0.5).as("startingBalance"),
          (n * 100.0).as("targetAmount"),
          lit("monthly").as("frequency"))).as("rolloverPeriod"))
    }
  }
}
