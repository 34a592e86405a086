package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** O6 — pinned column-order output contracts. The reference's sheet
  * consumers index by position (.DevContext/CRITICAL-START-HERE.md:29-62), so
  * column order IS correctness: a frozen priority list first, then any
  * unexpected columns appended in sorted order
  * (MonarchMoneyMain-v3.py:145-176, :83-137, :878-914).
  *
  * `headers(present)` is pure (driver-side column arithmetic, no data pass) —
  * property-tested independently of Spark.
  */
object Contracts {

  /** Transactions: the 29-column base order (v3:145-162), after dropping the
    * redundant accountDisplayName/accountId (P5, v3:167-169). */
  val transactionBase: Seq[String] = Seq(
    "__typename",
    "AccID", "AccDispName", "AccType",
    "amount", "attachments",
    "CatID", "CatDispName", "CatType",
    "date", "hideFromReports", "id", "isRecurring", "isSplitTransaction",
    "MrchntID", "MrchntDispName", "MrchntTranCount", "MrchntType",
    "needsReview", "notes", "pending", "plaidName", "reviewStatus",
    "tags", "TagsCSL",
    "createdAt", "updatedAt",
    "loadedAtUtc")

  val transactionDropped: Set[String] = Set("accountDisplayName", "accountId")

  /** v3:163-179 `_headers_rows`: base ∩ present (in base order), then the
    * sorted remainder. */
  def transactionHeaders(present: Seq[String]): Seq[String] = {
    val keys = present.toSet -- transactionDropped
    val head = transactionBase.filter(keys)
    head ++ (keys -- head).toSeq.sorted
  }

  /** Accounts: priority columns (v3:97), then the sorted remainder with
    * `type` forced immediately before `subtype` at type's alphabetical slot
    * (v3:105-127). */
  val accountPriority: Seq[String] = Seq(
    "id", "TypeDisplay", "AccountType", "displayName", "InstitutionName",
    "currentBalance", "displayBalance")

  def accountHeaders(present: Seq[String]): Seq[String] = {
    val keys = scala.collection.mutable.Set(present: _*)
    val head = accountPriority.filter(keys.contains)
    head.foreach(keys -= _)
    val remaining = keys.toSeq.sorted
    val tail =
      if (keys.contains("type") && keys.contains("subtype")) {
        // v3:108-127: remove both, re-sort, insert `type` at its sorted
        // position with `subtype` immediately after.
        val others = remaining.filterNot(k => k == "type" || k == "subtype")
        val pos = others.indexWhere(_ > "type") match {
          case -1 => others.length
          case i  => i
        }
        others.patch(pos, Seq("type", "subtype"), 0)
      } else remaining
    head ++ tail
  }

  /** Accounts row order: (TypeDisplay, AccountType, displayName) ascending
    * (v3:130-134). */
  val accountSort: Seq[Column] =
    Seq(col("TypeDisplay"), col("AccountType"), col("displayName"))

  /** Budgets: the 31-column priority list (v3:886-894). */
  val budgetPriority: Seq[String] = Seq(
    "RecordType", "CategoryGroupName", "CategoryGroupType", "DebitCreditFlag", "IsIncome",
    "CategoryName", "CategoryIcon", "IsSystemCategory", "ExcludeFromBudget",
    "Month", "PlannedCashFlow", "ActualAmount", "CumulativeActualAmount", "RemainingAmount",
    "PlannedSetAside", "RolloverAmount", "RolloverType", "RolloverPeriodId",
    "RolloverStartMonth", "RolloverEndMonth", "RolloverStartingBalance",
    "RolloverTargetAmount", "RolloverFrequency",
    "BudgetVariability", "GroupLevelBudgetingEnabled", "CategoryUpdatedAt",
    "CategoryGroupId", "CategoryId", "GroupOrder", "CategoryOrder", "LoadedAtUtc")

  def budgetHeaders(present: Seq[String]): Seq[String] = {
    val keys = present.toSet
    val head = budgetPriority.filter(keys)
    head ++ (keys -- head).toSeq.sorted
  }

  /** Budgets row order: (CategoryGroupName, CategoryName, Month) ascending
    * (v3:907-911). */
  val budgetSort: Seq[Column] =
    Seq(col("CategoryGroupName"), col("CategoryName"), col("Month"))

  /** Apply a contract: project the pinned order (a pure `select`, so column
    * pruning still reaches the scan underneath). */
  def apply(df: DataFrame, headers: Seq[String] => Seq[String]): DataFrame =
    df.select(headers(df.columns.toSeq).map(col): _*)

  def transactions(df: DataFrame): DataFrame = apply(df, transactionHeaders)
  def accounts(df: DataFrame): DataFrame =
    apply(df, accountHeaders).orderBy(accountSort: _*)
  def budgets(df: DataFrame): DataFrame =
    apply(df, budgetHeaders).orderBy(budgetSort: _*)
}
