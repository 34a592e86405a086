package graft

import org.apache.spark.sql.functions._

import graft.jobs.SyncTransactions
import graft.operators.Contracts
import graft.sources.{Synthetic, Tables}

/** §7.3 flagship end-to-end on sf0.001: flatten + scrub + J1 + A7 + merge +
  * contract in one composed plan. */
class SyncJobSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val result = {
    val orders = Tables.orders(spark, sfDir)
    val dim = Synthetic.accountsDim(Tables.customer(spark, sfDir))
    val existing = SyncTransactions.flattenBatch(
      Synthetic.nestedTransactions(
        orders.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))), dim)
    val fresh = Synthetic.nestedTransactions(
      orders.filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp")))
    SyncTransactions.sync(existing, fresh, dim, "1997-07-01", "2026-01-01 00:00:00").cache()
  }

  test("output column order follows the pinned transaction contract") {
    assert(result.columns.toSeq ==
      Contracts.transactionHeaders(result.columns.toSeq))
    assert(result.columns.head == "__typename" && result.columns.last == "loadedAtUtc")
  }

  test("every source order appears exactly once after the merge") {
    val total = Tables.orders(spark, sfDir).count()
    assert(result.count() == total)
    assert(result.select("id").distinct().count() == total)
  }

  test("kept rows predate the window and carry no load stamp; fresh rows carry it") {
    val kept = result.filter(col("date") < lit("1997-07-01").cast("date"))
    val fresh = result.filter(col("date") >= lit("1997-07-01").cast("date"))
    assert(kept.filter(col("loadedAtUtc").isNotNull).count() == 0)
    assert(fresh.filter(col("loadedAtUtc") =!= "2026-01-01 00:00:00").count() == 0)
    assert(kept.count() > 0 && fresh.count() > 0)
  }

  test("F1 scrub: amounts are typed doubles, negatives from paren strings") {
    assert(result.schema("amount").dataType == org.apache.spark.sql.types.DoubleType)
    // o_orderkey % 3 == 0 rows were built as ($x.xx)
    val negs = result.filter(col("id").cast("long") % 3 === 0)
    assert(negs.filter(col("amount") >= 0).count() == 0)
  }

  test("J1: account names resolve via the broadcast lookup when the struct is empty") {
    // even custkeys had null displayName in the struct: name must come from the dim
    val dimNames = Synthetic.accountsDim(Tables.customer(spark, sfDir))
      .filter(col("id").cast("long") % 2 === 0)
      .select("displayName").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSet
    val joined = result.filter(col("AccID").cast("long") % 2 === 0)
      .select("AccDispName").distinct()
      .collect().map(_.getString(0)).toSet
    assert(joined.nonEmpty && joined.subsetOf(dimNames))
  }

  test("A7: merchant counts match a direct group-by") {
    val direct = result.groupBy("MrchntID").count()
    val mismatch = result.select(col("MrchntID"), col("MrchntTranCount"))
      .join(direct, "MrchntID")
      // kept(full-existing-window) and fresh counts were computed per batch;
      // the merged table's per-merchant totals must still be >= each stamp
      .filter(col("MrchntTranCount").cast("long") > col("count"))
      .count()
    assert(mismatch == 0)
  }
}
