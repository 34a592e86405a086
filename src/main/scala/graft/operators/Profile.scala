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

  /** Equi-width histogram of a numeric column — the optimizer-statistics
    * companion to [[profile]] (selectivity estimation, skew detection, data
    * drift checks). `bins` buckets of width (max-min)/bins over the observed
    * range; values land in floor((v-min)/width), the max value closes into
    * the last bin, NULLs are excluded, and a constant column (width 0)
    * collapses into bin 0. Only OCCUPIED bins are emitted — at 100 TB the
    * output is at most `bins` rows either way, but empty-range scans emit
    * nothing rather than fabricating zero rows.
    *
    * Scale design: one tiny global (min, max) aggregate broadcast back as a
    * one-row frame, then one map-side-combined groupBy over at most `bins`
    * keys — two passes over a pushed-down single-column scan, nothing
    * driver-side. Bin edges are derived from the same broadcast doubles, so
    * every engine computes identical boundaries. */
  def histogram(df: DataFrame, column: String, bins: Int): DataFrame = {
    require(bins >= 1, s"histogram: bins must be >= 1, got $bins")
    val v = col(column).cast("double")
    val stats = df.filter(v.isNotNull)
      .agg(min(v).as("_min"), max(v).as("_max"))
    val width = (col("_max") - col("_min")) / bins
    val bin = when(width === 0.0, lit(0))
      .otherwise(least(floor((v - col("_min")) / width), lit(bins - 1)).cast("int"))
    df.filter(v.isNotNull)
      .crossJoin(broadcast(stats))
      .groupBy(bin.as("bin"), col("_min"), width.as("_w"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (col("_min") + col("bin") * col("_w")).as("bin_lo"),
        (col("_min") + (col("bin") + 1) * col("_w")).as("bin_hi"),
        col("n"))
      .orderBy(col("bin"))
  }
}
