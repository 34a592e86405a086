package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for each left row, the single right row with
  * the greatest `rightTs <= leftTs` for the same key (attribution joins,
  * latest-snapshot enrichment — the S5 account-history shape generalized).
  *
  * Spark has no native as-of join; the Spark-first composition is: union
  * both sides, ONE shuffle+sort on (key, ts), carry the last-seen right
  * values forward with an ignoreNulls `last()` running window, keep the
  * left rows. That is asymptotically optimal (any as-of join must co-locate
  * by key and order by time) and avoids the naive range-join explosion
  * (left × all-earlier-right pairs then argmax — quadratic per key).
  *
  * Left rows with no earlier right row keep NULL carried values (left-asof
  * semantics, matching `ASOF LEFT JOIN` in engines that have it natively).
  *
  * `rightTie` must be unique among right rows sharing (key, rightTs) so the
  * carried row — and therefore the result — is deterministic.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, carryCols: Seq[String],
           rightTie: String, prefix: String = "asof_"): DataFrame = {
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
    // all carry columns ride in ONE struct (non-null exactly on right rows):
    // ignoreNulls-last then skips only the left rows' placeholders, so a
    // NULL inside the latest right row is carried as NULL (never replaced by
    // an older row's value) and the carried columns always come from the
    // SAME right row — no tearing across columns
    val r = right.select(
      col(key), col(rightTs).as("_ts"), lit(0).as("_side"),
      col(rightTie).as("_tie"),
      struct(carryCols.map(col): _*).as("_c"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left at equal ts ("at or before" includes them);
    // _tie orders equal-ts right rows so last() is deterministic
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_carried", last(col("_c"), ignoreNulls = true).over(w))
    carryCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"$prefix$c", col(s"_carried.$c"))
    }
      .filter(col("_side") === 1)
      .drop("_ts", "_side", "_tie", "_c", "_carried")
  }
}
