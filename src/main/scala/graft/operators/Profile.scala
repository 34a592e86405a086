package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE-style stats pass every warehouse runs
  * before planning work on an unknown table: per-column row/null/distinct
  * counts and min/max, as ROWS (one per column) so the profile of a
  * thousand-column table is still a readable table.
  *
  * Scale design: ONE aggregation pass produces every column's stats
  * simultaneously (a single one-row global aggregate — Spark evaluates the
  * distinct aggregates via its standard expand rewrite, still one plan,
  * map-side partials); the row-per-column shape is a row-local explode of
  * that one row. No per-column jobs, no driver loops.
  *
  * min/max are emitted as strings for a uniform schema; give doubles a
  * deterministic rounding upstream if cross-engine string parity matters
  * (integer, string, and date renderings agree across engines).
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile: need at least one column")
    val aggCols = columns.flatMap { c => Seq(
      count(lit(1)).as(s"__rows_$c"),
      count(col(c)).as(s"__n_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")) }
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val rows = array(columns.map(c => struct(
      lit(c).as("column"),
      col(s"__n_$c").as("n_nonnull"),
      (col(s"__rows_$c") - col(s"__n_$c")).as("n_null"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__min_$c").as("min_value"),
      col(s"__max_$c").as("max_value"))): _*)
    one.select(explode(rows).as("_s")).select(col("_s.*")).orderBy(col("column"))
  }
}
