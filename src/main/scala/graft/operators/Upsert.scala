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

  /** CDC changelog derivation — the inverse of [[upsert]]: diff two keyed
    * snapshots and emit the row-level change set that turns `oldDf` into
    * `newDf`. The reference consumes per-row mutations; a warehouse only
    * holds the before/after snapshots, so deriving inserts/updates/deletes
    * FROM snapshots is how its mutation stream is reconstructed (and how
    * incremental downstream rebuilds avoid full recomputes).
    *
    * op per key: 'I' (key only in `newDf`), 'D' (key only in `oldDf`),
    * 'U' (key in both, any tracked column differs null-safely). Unchanged
    * keys emit nothing — the changelog is |changes|-sized, not
    * snapshot-sized. Output: keyCols, op, then <c>_old and <c>_new for each
    * tracked column. Keys must be unique per snapshot (primary-key
    * semantics, same contract as [[upsert]]'s fresh side).
    *
    * Scale design: ONE full-outer hash join on the key — both snapshots
    * shuffle once; with both sides bucketed on the key
    * ([[Bucketing.writeBucketed]]) the join is exchange-free. Change
    * detection is a row-local null-safe compare; nothing driver-side. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff: need at least one key column")
    require(compareCols.nonEmpty, "snapshotDiff: need at least one tracked column")
    val o = oldDf.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"${c}_old")) :+ lit(true).as("_in_old"): _*)
    val n = newDf.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"${c}_new")) :+ lit(true).as("_in_new"): _*)
    val changed = compareCols
      .map(c => !(col(s"${c}_old") <=> col(s"${c}_new")))
      .reduce(_ || _)
    o.join(n, keyCols, "full_outer")
      .withColumn("op",
        when(col("_in_old").isNull, lit("I"))
          .when(col("_in_new").isNull, lit("D"))
          .when(changed, lit("U")))
      .filter(col("op").isNotNull)
      .select(keyCols.map(col) ++ (col("op") +:
        compareCols.flatMap(c => Seq(col(s"${c}_old"), col(s"${c}_new")))): _*)
  }

  /** Invert a [[snapshotDiff]] changelog: swap every <c>_old/<c>_new pair
    * and flip I<->D ('U' stays 'U' with its sides swapped). Applying the
    * inverse rolls the new snapshot back to the old one — the rollback /
    * undo path of CDC — and algebraically
    * invertChangelog(snapshotDiff(a, b)) == snapshotDiff(b, a), which is
    * exactly what the oracle checks. Row-local projection, no shuffle. */
  def invertChangelog(changelog: DataFrame, compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "invertChangelog: need at least one tracked column")
    val swapped = compareCols.flatMap(c => Seq(s"${c}_old", s"${c}_new")).toSet + "op"
    val keyCols = changelog.columns.filterNot(swapped)
    changelog.select(keyCols.map(col) ++
      (when(col("op") === "I", lit("D"))
        .when(col("op") === "D", lit("I"))
        .otherwise(col("op")).as("op") +:
        compareCols.flatMap(c => Seq(
          col(s"${c}_new").as(s"${c}_old"),
          col(s"${c}_old").as(s"${c}_new")))): _*)
  }
}
