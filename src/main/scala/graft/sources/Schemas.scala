package graft.sources

import org.apache.spark.sql.types._

/** Explicit entity schemas for the reference's data model (SURVEY §1.3/§1.4,
  * FIXTURES.md). One `StructType` per entity replaces the reference's entire
  * defensive duck-typing layer (`_to_dict`/`_as_dict`/`_get_field`,
  * MonarchMoneyMain-v3.py:53-74,203-229): with a declared schema, malformed
  * fields arrive as null instead of needing per-row try/except.
  *
  * IDs are strings throughout (18-digit decimal ids overflow int32 and can
  * carry leading zeros — `.mm/last_txn_probe.json`), money is double (the
  * reference uses binary float end-to-end), dates are DateType and timestamps
  * TimestampType with a UTC session zone.
  */
object Schemas {

  // ---- Transaction (monarchmoney.py:1459-1506 TransactionOverviewFields) ----

  val tagSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("color", StringType),
    StructField("order", IntegerType),
    StructField("__typename", StringType)))

  val attachmentSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("extension", StringType),
    StructField("filename", StringType),
    StructField("originalAssetUrl", StringType),
    StructField("publicId", StringType),
    StructField("sizeBytes", LongType)))

  val transactionSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("amount", DoubleType),
    StructField("pending", BooleanType),
    StructField("date", DateType),
    StructField("hideFromReports", BooleanType),
    StructField("plaidName", StringType),
    StructField("notes", StringType),
    StructField("isRecurring", BooleanType),
    StructField("reviewStatus", StringType), // null | reviewed | needs_review
    StructField("needsReview", BooleanType),
    StructField("attachments", ArrayType(attachmentSchema)),
    StructField("isSplitTransaction", BooleanType),
    StructField("createdAt", TimestampType),
    StructField("updatedAt", TimestampType),
    StructField("category", StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType),
      StructField("__typename", StringType)))),
    StructField("merchant", StructType(Seq(
      StructField("name", StringType),
      StructField("id", StringType),
      StructField("transactionsCount", LongType),
      StructField("__typename", StringType)))),
    StructField("account", StructType(Seq(
      StructField("id", StringType),
      StructField("displayName", StringType),
      StructField("__typename", StringType)))),
    StructField("tags", ArrayType(tagSchema)),
    StructField("__typename", StringType)))

  // ---- Account (monarchmoney.py:148-206 AccountFields) ----

  val typeSubtypeSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("display", StringType),
    StructField("__typename", StringType)))

  val institutionSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("primaryColor", StringType),
    StructField("url", StringType)))

  val accountSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("displayName", StringType),
    StructField("syncDisabled", BooleanType),
    StructField("deactivatedAt", TimestampType),
    StructField("isHidden", BooleanType),
    StructField("isAsset", BooleanType),
    StructField("mask", StringType),
    StructField("createdAt", TimestampType),
    StructField("updatedAt", TimestampType),
    StructField("displayLastUpdatedAt", TimestampType),
    StructField("currentBalance", DoubleType),
    StructField("displayBalance", DoubleType),
    StructField("includeInNetWorth", BooleanType),
    StructField("hideFromList", BooleanType),
    StructField("hideTransactionsFromReports", BooleanType),
    StructField("includeBalanceInNetWorth", BooleanType),
    StructField("includeInGoalBalance", BooleanType),
    StructField("dataProvider", StringType),
    StructField("dataProviderAccountId", StringType),
    StructField("isManual", BooleanType),
    StructField("transactionsCount", IntegerType),
    StructField("holdingsCount", IntegerType),
    StructField("manualInvestmentsTrackingMethod", StringType),
    StructField("order", IntegerType),
    StructField("icon", StringType),
    StructField("logoUrl", StringType),
    StructField("type", typeSubtypeSchema),
    StructField("subtype", typeSubtypeSchema),
    StructField("institution", institutionSchema),
    StructField("__typename", StringType)))

  // ---- Category / CategoryGroup / Tag dims (monarchmoney.py:1664-1696,
  //      1749-1770, 1898-1922) ----

  val categorySchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("order", IntegerType),
    StructField("name", StringType),
    StructField("systemCategory", StringType),
    StructField("isSystemCategory", BooleanType),
    StructField("isDisabled", BooleanType),
    StructField("updatedAt", TimestampType),
    StructField("createdAt", TimestampType),
    StructField("group", StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType),
      StructField("type", StringType)))))) // "income" | "expense"

  val categoryGroupSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("order", IntegerType),
    StructField("type", StringType),
    StructField("updatedAt", TimestampType),
    StructField("createdAt", TimestampType)))

  // ---- Budget response (monarchmoney.py:1134-1296; consumed v3:536-876) ----

  val monthlyAmountSchema: StructType = StructType(Seq(
    StructField("month", StringType), // YYYY-MM-01
    StructField("plannedCashFlowAmount", DoubleType),
    StructField("plannedSetAsideAmount", DoubleType),
    StructField("actualAmount", DoubleType),
    StructField("remainingAmount", DoubleType),
    StructField("previousMonthRolloverAmount", DoubleType),
    StructField("rolloverType", StringType)))

  val rolloverPeriodSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("startMonth", StringType),
    StructField("endMonth", StringType),
    StructField("startingBalance", DoubleType),
    StructField("targetAmount", DoubleType),
    StructField("frequency", StringType)))

  /** monthlyAmountsByCategory[] element (lib:1136-1160). */
  val categoryMonthlySchema: StructType = StructType(Seq(
    StructField("category", StructType(Seq(StructField("id", StringType)))),
    StructField("monthlyAmounts", ArrayType(monthlyAmountSchema))))

  /** monthlyAmountsByCategoryGroup[] element (lib:1161-1181). */
  val groupMonthlySchema: StructType = StructType(Seq(
    StructField("categoryGroup", StructType(Seq(StructField("id", StringType)))),
    StructField("monthlyAmounts", ArrayType(monthlyAmountSchema))))

  /** monthlyAmountsForFlexExpense[] element. */
  val flexMonthlySchema: StructType = StructType(Seq(
    StructField("budgetVariability", StringType),
    StructField("monthlyAmounts", ArrayType(monthlyAmountSchema))))

  val totalsBucketSchema: StructType = StructType(Seq(
    StructField("plannedAmount", DoubleType),
    StructField("actualAmount", DoubleType),
    StructField("remainingAmount", DoubleType),
    StructField("previousMonthRolloverAmount", DoubleType)))

  /** totalsByMonth[] element (lib:1182-1220). */
  val totalsByMonthSchema: StructType = StructType(Seq(
    StructField("month", StringType),
    StructField("totalIncome", totalsBucketSchema),
    StructField("totalExpenses", totalsBucketSchema),
    StructField("totalFixedExpenses", totalsBucketSchema),
    StructField("totalNonMonthlyExpenses", totalsBucketSchema),
    StructField("totalFlexibleExpenses", totalsBucketSchema)))

  /** Budget categoryGroups dim with nested categories (lib:1222-1260). */
  val budgetCategoryGroupSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("order", IntegerType),
    StructField("groupLevelBudgetingEnabled", BooleanType),
    StructField("budgetVariability", StringType),
    StructField("type", StringType),
    StructField("rolloverPeriod", rolloverPeriodSchema),
    StructField("categories", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType),
      StructField("order", IntegerType),
      StructField("icon", StringType),
      StructField("isSystemCategory", BooleanType),
      StructField("excludeFromBudget", BooleanType),
      StructField("updatedAt", StringType),
      StructField("budgetVariability", StringType),
      StructField("rolloverPeriod", rolloverPeriodSchema)))))))

  // ---- Holdings / snapshots / recurring (monarchmoney.py:731-777, 259-333,
  //      2667-2731) ----

  val holdingEdgeSchema: StructType = StructType(Seq(
    StructField("node", StructType(Seq(
      StructField("id", StringType),
      StructField("quantity", DoubleType),
      StructField("basis", DoubleType),
      StructField("totalValue", DoubleType),
      StructField("securityPriceChangeDollars", DoubleType),
      StructField("securityPriceChangePercent", DoubleType),
      StructField("lastSyncedAt", DateType),
      StructField("holdings", ArrayType(StructType(Seq(
        StructField("id", StringType),
        StructField("type", StringType),
        StructField("typeDisplay", StringType),
        StructField("name", StringType),
        StructField("ticker", StringType),
        StructField("closingPrice", DoubleType),
        StructField("isManual", BooleanType),
        StructField("closingPriceUpdatedAt", TimestampType))))),
      StructField("security", StructType(Seq(
        StructField("id", StringType),
        StructField("name", StringType),
        StructField("type", StringType),
        StructField("ticker", StringType),
        StructField("typeDisplay", StringType),
        StructField("currentPrice", DoubleType),
        StructField("currentPriceUpdatedAt", TimestampType),
        StructField("closingPrice", DoubleType),
        StructField("closingPriceUpdatedAt", TimestampType),
        StructField("oneDayChangePercent", DoubleType),
        StructField("oneDayChangeDollars", DoubleType)))))))))

  val recurringItemSchema: StructType = StructType(Seq(
    StructField("stream", StructType(Seq(
      StructField("id", StringType),
      StructField("frequency", StringType),
      StructField("amount", DoubleType),
      StructField("isApproximate", BooleanType),
      StructField("merchant", StructType(Seq(
        StructField("id", StringType),
        StructField("name", StringType),
        StructField("logoUrl", StringType))))))),
    StructField("date", DateType),
    StructField("isPast", BooleanType),
    StructField("transactionId", StringType),
    StructField("amount", DoubleType),
    StructField("amountDiff", DoubleType),
    StructField("category", StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType)))),
    StructField("account", StructType(Seq(
      StructField("id", StringType),
      StructField("displayName", StringType),
      StructField("logoUrl", StringType))))))
}
