package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A2/A3 — the reference's 4-aggregates-in-one-round-trip cashflow query
  * (monarchmoney.py:2253-2356): byCategory, byCategoryGroup, byMerchant and a
  * global summary over one shared filter.
  *
  * Implemented as a single GROUPING SETS pass so the source is scanned once
  * (the reference's single-round-trip property); at 100 TB this is one
  * shuffle instead of four scans.
  */
object Cashflow {

  /** One grouping-sets aggregation: one grouping set per dim column plus the
    * global `()` set, via the typed Dataset.groupingSets API (no temp-view
    * round-trip, no identifier interpolation, thread-safe). Dim values are
    * coalesced to 'TOTAL' on the sets where they are inactive so output rows
    * are self-describing; `gid` (grouping_id) stays in the output so genuine
    * NULL dim values remain distinguishable from roll-up rows. */
  def groupingSets(df: DataFrame, dims: Seq[String], amount: Column): DataFrame = {
    val withAmt = df.withColumn("_amt", amount)
    val sets: Seq[Seq[Column]] = dims.map(d => Seq(col(d))) :+ Seq.empty[Column]
    withAmt.groupingSets(sets, dims.map(col): _*)
      .agg(
        grouping_id().as("gid"),
        round(sum(when(col("_amt") > 0, col("_amt")).otherwise(0.0)), 2).as("sum_income"),
        round(sum(when(col("_amt") < 0, col("_amt")).otherwise(0.0)), 2).as("sum_expense"),
        round(sum(col("_amt")), 2).as("savings"))
      .select(dims.map(d => coalesce(col(d).cast("string"), lit("TOTAL")).as(d)) ++
        Seq(col("gid"), col("sum_income"), col("sum_expense"), col("savings")): _*)
  }

  /** A3 — global-only summary leg with savingsRate = savings / sumIncome.
    * Empty input yields ZEROS, not nulls — the mirrored query requests
    * `fillEmptyValues: true` (monarchmoney.py:2316). */
  def summary(df: DataFrame, amount: Column): DataFrame =
    df.agg(
        coalesce(sum(when(amount > 0, amount).otherwise(0.0)), lit(0.0)).as("sum_income"),
        coalesce(sum(when(amount < 0, amount).otherwise(0.0)), lit(0.0)).as("sum_expense"))
      .withColumn("savings", col("sum_income") + col("sum_expense"))
      .withColumn("savings_rate",
        when(col("sum_income") =!= 0.0, col("savings") / col("sum_income")))
}
