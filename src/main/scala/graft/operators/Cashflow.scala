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
    * global `()` set. Dim values are coalesced to 'TOTAL' on the sets where
    * they are inactive so output rows are self-describing. */
  def groupingSets(df: DataFrame, dims: Seq[String], amount: Column): DataFrame = {
    val spark = df.sparkSession
    val view = s"graft_cashflow_${System.identityHashCode(df).toHexString}"
    df.withColumn("_amt", amount).createOrReplaceTempView(view)
    val sets = (dims.map(d => s"($d)") :+ "()").mkString(", ")
    val dimSelect = dims
      .map(d => s"coalesce(cast($d as string), 'TOTAL') AS $d")
      .mkString(", ")
    spark.sql(s"""
      SELECT $dimSelect,
             grouping_id() AS gid,
             round(sum(CASE WHEN _amt > 0 THEN _amt ELSE 0 END), 2) AS sum_income,
             round(sum(CASE WHEN _amt < 0 THEN _amt ELSE 0 END), 2) AS sum_expense,
             round(sum(_amt), 2) AS savings
      FROM $view
      GROUP BY GROUPING SETS ($sets)
    """)
  }

  /** A3 — global-only summary leg with savingsRate = savings / sumIncome. */
  def summary(df: DataFrame, amount: Column): DataFrame =
    df.agg(
        sum(when(amount > 0, amount).otherwise(0.0)).as("sum_income"),
        sum(when(amount < 0, amount).otherwise(0.0)).as("sum_expense"))
      .withColumn("savings", col("sum_income") + col("sum_expense"))
      .withColumn("savings_rate",
        when(col("sum_income") =!= 0.0, col("savings") / col("sum_income")))
}
