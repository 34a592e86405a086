package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Functions._
import graft.operators.{Contracts, Flatten, IncrementalMerge, Lookup, Windows}

/** The reference's core job, SURVEY §7.3: incremental transaction sync
  * (MonarchMoneyMain-v3.py:1217-1337) as one composed Spark plan —
  * control-window filter -> F7 flatten -> F1 money scrub -> A4 TagsCSL ->
  * J1 account-name lookup -> A7 merchant count -> F14 loadedAtUtc ->
  * P3+U1 watermark merge -> O6 29-column contract.
  *
  * Scale posture: every transform is row-local except the J1 broadcast join
  * (bona-fide dim), the A7 window (one shuffle on merchant id) and the merge
  * union (no shuffle). With the target table date-partitioned the merge is a
  * partition overwrite (SURVEY §7.5 risk 7).
  */
object SyncTransactions {

  /** F1's 19 scrub-eligible dollar fields (v3:514-519). */
  val dollarFields: Seq[String] = Seq(
    "amount", "balance", "availableBalance", "currentBalance", "clearedBalance",
    "value", "price", "cost", "fee", "total", "subtotal", "tax",
    "interestAmount", "principalAmount", "minimumPayment", "creditLimit",
    "availableCredit", "accountBalance", "runningBalance")

  /** Scrub every present string-typed dollar field to double (v3:513-532). */
  def scrubMoney(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields
      .filter(f => f.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name).toSet
    dollarFields.filter(stringCols).foldLeft(df)((d, f) =>
      d.withColumn(f, parse_money(col(f))))
  }

  /** Flatten + scrub + J1 enrich + A7 merchant count over one extraction
    * batch of nested transactions.
    *
    * J1 (v3:1104-1110, 1272-1274): the reference computes a redundant
    * `accountDisplayName` from the lookup map and then drops it (P5); here
    * the lookup back-fills `AccDispName` where the embedded struct had no
    * display name — same join, observable output. */
  def flattenBatch(nested: DataFrame, accountsDim: DataFrame): DataFrame = {
    val flat = scrubMoney(Flatten.transaction(nested))
    val enriched = Lookup.join(flat, accountsDim, "AccID", "id",
      Seq(("displayName", "_acct_name", "")))
    val named = enriched
      .withColumn("AccDispName",
        when(col("AccDispName") =!= "", col("AccDispName")).otherwise(col("_acct_name")))
      .drop("_acct_name")
    // A7 merchant count as count+broadcast-join (merchants are dim-like; the
    // window form would sort the whole batch by merchant id).
    // The batch is materialized once first: groupCountJoin reads its input
    // TWICE (the count aggregate and the probe side share no exchange
    // Catalyst could reuse), and this input is the whole flatten + scrub +
    // enrich chain — without the checkpoint every sync leg ran that chain
    // twice (guide §5; the flattened batch is exactly what the merge
    // union consumes anyway)
    Windows.groupCountJoin(
      named.drop("MrchntTranCount").localCheckpoint(false),
      "MrchntID", "MrchntTranCount")
  }

  /** Full sync step: merge the flattened fresh batch over the existing table
    * at `windowStart` (strict `<` keep, v3:1312-1326) and project the pinned
    * 29-column contract. `loadedAt` is one pre-formatted batch stamp
    * (F14, v3:1269-1275 — a single run_ts, never per-row now()). */
  def sync(existing: DataFrame, freshNested: DataFrame, accountsDim: DataFrame,
           windowStart: String, loadedAt: String): DataFrame = {
    val fresh = flattenBatch(freshNested, accountsDim)
      .withColumn("loadedAtUtc", lit(loadedAt))
    Contracts.transactions(
      IncrementalMerge.merge(existing, fresh, "date", windowStart))
  }
}
