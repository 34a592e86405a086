package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K5 — the read-shape analog of the reference's row-level mutation surface:
  * `update_transaction` (monarchmoney.py:2410-2570), `create_transaction`
  * (monarchmoney.py:1556-1613), `delete_transaction` (monarchmoney.py:
  * 1615-1662) and the account equivalents (monarchmoney.py:356-598). The
  * reference mutates rows one id at a time against the remote store; the
  * honest Spark analog is a set-oriented MERGE: matched keys are replaced,
  * unmatched keys are inserted, deletes are an anti join.
  *
  * Scale posture: one hash shuffle of both sides on the key (the anti join),
  * plus a shuffle-free union. With the target table bucketed on the key
  * (operators/Bucketing) the anti join is exchange-free; with it
  * date-partitioned, pair with IncrementalMerge for partition-scoped
  * rewrites. Nothing is collected to the driver and the fresh side is never
  * assumed broadcast-small — AQE downgrades the anti join to a broadcast
  * when it measures small.
  */
object Upsert {

  /** MERGE on `idCol`: every `existing` row whose key appears in `fresh` is
    * replaced by the fresh row (the reference's update semantics — the
    * mutation payload carries the full row, monarchmoney.py:2478-2520);
    * fresh keys absent from `existing` are inserted (create). `fresh` must
    * be unique on the key — the reference addresses one row per mutation id,
    * so duplicate fresh keys are a caller error (both copies would land,
    * exactly like issuing two creates).
    *
    * Schemas are aligned with `unionByName(allowMissingColumns = true)`:
    * a column only one side carries is null on the other, mirroring the
    * union-of-keys header logic the sheet writer applies (v3:165-176). */
  def upsert(existing: DataFrame, fresh: DataFrame, idCol: String): DataFrame =
    existing.join(fresh.select(col(idCol)), Seq(idCol), "left_anti")
      .unionByName(fresh, allowMissingColumns = true)

  /** DELETE by key (monarchmoney.py:1615-1662, 560-598): drop every
    * `existing` row whose key appears in `ids`. */
  def delete(existing: DataFrame, ids: DataFrame, idCol: String): DataFrame =
    existing.join(ids.select(col(idCol)), Seq(idCol), "left_anti")
}
