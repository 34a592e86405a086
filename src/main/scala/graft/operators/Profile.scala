package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Population Stability Index between a baseline and a current slice of
    * one column — the drift monitor every long-running ingest needs (did
    * this month's `value` distribution move vs last month's?). Bins are
    * equi-width over the COMBINED range so both slices share boundaries;
    * per-bin psi = (p - q) * ln(p / q) with proportions floored at
    * `probFloor` so an empty bin contributes a large-but-finite term
    * instead of ±inf. Total PSI is the sum of the `psi` column ( < 0.1
    * stable, > 0.25 drifted, by the usual credit-scoring rule of thumb).
    * Rows with a null value or null slice flag are excluded.
    *
    * Scale design: same as [[histogram]] — one tiny (min, max) aggregate
    * broadcast back, one map-side-combined groupBy over at most `bins`
    * keys carrying BOTH slices' conditional counts in a single pass, then
    * a one-row totals attach. Two scans of a pushed-down one-column
    * projection; psi is rounded to 6 so libm ln() ulp differences cannot
    * leak across engines. */
  def driftPsi(df: DataFrame, valueCol: String, isBaseline: Column, bins: Int,
               probFloor: Double = 1e-4): DataFrame = {
    require(bins >= 1, s"driftPsi: bins must be >= 1, got $bins")
    require(probFloor > 0 && probFloor < 1,
      s"driftPsi: probFloor must be in (0, 1), got $probFloor")
    val v = col(valueCol).cast("double")
    val rows = df.filter(v.isNotNull && isBaseline.isNotNull)
      .select(v.as("_v"), isBaseline.cast("boolean").as("_base"))
    val stats = rows.agg(min(col("_v")).as("_min"), max(col("_v")).as("_max"))
    val width = (col("_max") - col("_min")) / bins
    val bin = when(width === 0.0, lit(0))
      .otherwise(least(floor((col("_v") - col("_min")) / width), lit(bins - 1)).cast("int"))
    val counts = rows.crossJoin(broadcast(stats))
      .groupBy(bin.as("bin"))
      .agg(sum(when(col("_base"), 1L).otherwise(0L)).as("n_base"),
        sum(when(!col("_base"), 1L).otherwise(0L)).as("n_curr"))
    val totals = counts.agg(sum(col("n_base")).as("_tb"), sum(col("n_curr")).as("_tc"))
    def prop(n: Column, tot: Column) =
      greatest(when(tot > 0, n.cast("double") / tot).otherwise(0.0), lit(probFloor))
    val p = prop(col("n_base"), col("_tb"))
    val q = prop(col("n_curr"), col("_tc"))
    counts.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_base"), col("n_curr"),
        round((p - q) * log(p / q), 6).as("psi"))
      .orderBy(col("bin"))
  }

  /** EXACT global quantiles of an integral column without a global sort —
    * the order statistic (p50/p99 latency, price percentiles) that naive
    * SQL computes with an unpartitioned window (one task scanning the whole
    * table; the shape PlanAuditSpec exists to reject) and approx sketches
    * only estimate. Quantiles are given in basis points (`qBp` 5000 = p50)
    * and resolved with pure integer arithmetic — rank = ceil(qBp*n/10000) =
    * (qBp*n + 9999) div 10000 — so every engine lands on the same row; the
    * value at a rank is well-defined under duplicate values, so no
    * tie-break column is needed.
    *
    * Scale design (same posture as Sampling.tokenBudgetSelect): (1) one
    * (min, max, count) aggregate; (2) one map-side-combined groupBy builds
    * an equi-width histogram of at most `granularity`+1 buckets, collected
    * (bounded, metadata-scale); (3) the driver walks cumulative counts to
    * locate each target rank's bucket and in-bucket offset; (4) ONLY the
    * target buckets' rows — a ~1/granularity fraction of the corpus each,
    * bounded by the distribution — pay a bucket-PARTITIONED row_number, and
    * a broadcast join against the driver's (bucket, offset) targets picks
    * the exact rows. Three passes over a pushed-down one-column scan; no
    * global sort anywhere. */
  def exactQuantiles(df: DataFrame, valueCol: String, qBp: Seq[Int],
                     granularity: Int = 1000): DataFrame = {
    require(qBp.nonEmpty, "exactQuantiles: need at least one quantile")
    qBp.foreach(q => require(q >= 1 && q <= 10000,
      s"exactQuantiles: quantiles are basis points in [1, 10000], got $q"))
    require(granularity >= 1, s"exactQuantiles: granularity must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val clean = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("_v"))
    val stats = clean.agg(min(col("_v")), max(col("_v")), count(lit(1))).head()
    val empty = Seq.empty[(Long, Long, Long)].toDF("q_bp", "rk", "_off")
      .select(col("q_bp"), col("rk"), lit(0L).as("value"), lit(0L).as("n"))
    if (stats.isNullAt(0)) return empty
    val (mn, mx, n) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    val width = math.max(1L, (mx - mn) / granularity + 1)
    // integral DIV, not floating floor(a/b): exact at any magnitude
    val bucketed = clean.withColumn("_b", expr(s"(_v - ${mn}L) DIV ${width}L"))
    val hist = bucketed.groupBy(col("_b")).agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val targets = qBp.sorted.distinct.map { q =>
      val rk = (q.toLong * n + 9999L) / 10000L // ceil(q*n/10000), integer-exact
      var cum = 0L
      val (b, cumBefore) = hist.iterator.map { case (b, c) =>
        val before = cum; cum += c; (b, before, cum)
      }.find(_._3 >= rk).map(t => (t._1, t._2)).get // rk <= n, always found
      (q.toLong, rk, b, rk - cumBefore)
    }
    val targetDf = targets.toDF("q_bp", "rk", "_tb", "_off")
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_b")).orderBy(col("_v"))
    bucketed.filter(col("_b").isin(targets.map(_._3): _*))
      .withColumn("_rn", row_number().over(wb).cast("long"))
      .join(broadcast(targetDf), col("_b") === col("_tb") && col("_rn") === col("_off"))
      .select(col("q_bp"), col("rk"), col("_v").as("value"), lit(n).as("n"))
      .orderBy(col("q_bp"))
  }
}
