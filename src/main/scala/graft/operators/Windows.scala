package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.5 — window-function semantics the reference carries as denormalized
  * fields: CumulativeActualAmount running totals (A6, v3:613),
  * previousMonthRolloverAmount lag (lib:1147...), per-merchant counts (A7).
  */
object Windows {

  /** A6 — running total per partition in order. `orderBy` must end with a
    * unique tiebreak for deterministic sums over equal keys. */
  def runningTotal(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column],
                   value: Column, as: String = "running_total"): DataFrame =
    df.withColumn(as,
      sum(value).over(
        Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** previousMonthRolloverAmount — lag(1) with 0.0 default. */
  def previousPeriod(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column],
                     value: Column, as: String = "prev_amount"): DataFrame =
    df.withColumn(as,
      coalesce(
        lag(value, 1).over(Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)),
        lit(0.0)))

  /** Per-group top-k via the [[graft.Functions.top_k_by]] bounded-heap
    * aggregate instead of `row_number().over(...) <= k`. The window form
    * shuffles and sorts every row of every group; this form partial-
    * aggregates map-side, so at most k rows per (group, partition) reach the
    * shuffle — the difference between sorting a million-row group and
    * shipping k rows of it. Output: group cols, `rank` (1-based), payload.
    *
    * Behavioral notes vs the `row_number()` window form it replaces:
    * ties on `ordCol` need a unique `tieCol` for a deterministic order, and
    * a group whose every row has a NULL ord/tie/payload aggregates to an
    * empty array, so that group VANISHES from the output (posexplode of an
    * empty array), whereas the window form would still emit its rows. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], payloadCol: String,
                   ordCol: String, tieCol: String, k: Int): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.Functions.top_k_by(col(payloadCol), col(ordCol), col(tieCol), k).as("_topk"))
      .select((groupCols.map(col) :+ posexplode(col("_topk"))): _*)
      .withColumn("rank", (col("pos") + 1).cast("int"))
      .drop("pos")
      .withColumnRenamed("col", payloadCol)
      .select((groupCols.map(col) :+ col("rank") :+ col(payloadCol)): _*)

  /** A7 — denormalized per-group count carried on each row
    * (merchant.transactionsCount). Unbounded window, no sort needed. */
  def groupCount(df: DataFrame, partitionBy: Seq[Column], as: String): DataFrame =
    df.withColumn(as, count(lit(1)).over(Window.partitionBy(partitionBy: _*)))

  /** SCD2 interval compression — collapse a per-key ordered series of
    * attribute observations into validity intervals, keeping only change
    * points: a row survives when it is the first of its key or any tracked
    * value differs (null-safely) from the previous observation; `valid_from`
    * is the observation's order value and `valid_to` the NEXT change point's
    * (exclusive; NULL = still current). The type-2 slowly-changing-dimension
    * build every warehouse pipeline needs over snapshot feeds (the
    * reference's recentBalances daily series is exactly such a feed).
    *
    * Scale design: both windows share one partitioning and ordering, so the
    * plan is a single hash shuffle on the key + one sort — the minimum any
    * order-sensitive compression can do; the lead() runs on the already-
    * filtered change points (a fraction of the input). Keys are data-scale
    * (one partition per entity), never a global window. */
  def scd2Compress(df: DataFrame, keyCols: Seq[String], orderCol: String,
                   valueCols: Seq[String], fromAs: String = "valid_from",
                   toAs: String = "valid_to"): DataFrame = {
    require(valueCols.nonEmpty, "scd2Compress: need at least one tracked value column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val changed = valueCols
      .map(v => !(col(v) <=> lag(col(v), 1).over(w)))
      .reduce(_ || _) || lag(col(orderCol), 1).over(w).isNull
    df.withColumn("_chg", changed).filter(col("_chg"))
      .withColumn(fromAs, col(orderCol))
      .withColumn(toAs, lead(col(orderCol), 1).over(w))
      .select((keyCols.map(col) ++ valueCols.map(col)
        :+ col(fromAs) :+ col(toAs)): _*)
  }

  /** Point-in-time (as-of) lookup over an [[scd2Compress]] history: the
    * version of every entity that was valid at `at` — the feature-store /
    * audit query SCD2 histories exist to answer (train-time features must
    * come from the version current AT the label's timestamp, never a later
    * one). Row-local filter on [valid_from, valid_to): entities born after
    * `at` drop out, the open current version (NULL valid_to) matches any
    * later `at`. With the history partitioned/Z-ordered on the validity
    * columns ([[Layout]]), the filter prunes at the scan. */
  def scd2AsOf(hist: DataFrame, at: Column,
               fromCol: String = "valid_from", toCol: String = "valid_to"): DataFrame =
    hist.filter(col(fromCol) <= at && (col(toCol).isNull || at < col(toCol)))

  /** A7 via partial aggregation + broadcast join — the scale-preferred form
    * when the group key is dim-like (merchants, categories): the window
    * variant repartitions AND sorts the full fact table by the key, while
    * this does a map-side-combined count whose tiny result broadcasts back.
    * Costs a second pass over the input, which is cheap when the input is a
    * pushed-down columnar scan.
    * Null-safe on the key (`<=>`): rows with a NULL key keep their group
    * count instead of being dropped by the join, matching the window form. */
  def groupCountJoin(df: DataFrame, keyCol: String, as: String): DataFrame = {
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as(as))
      .withColumnRenamed(keyCol, "_gc_key")
    df.join(broadcast(counts), df(keyCol) <=> counts("_gc_key"))
      .drop("_gc_key")
  }

  /** Time-series gap fill + forward fill (resampling a sparse daily series
    * to a dense one — balance curves, metric dashboards, feature windows):
    * per key, every calendar day from the key's first to last observation
    * gets a row; days with no observation carry the last observed value
    * forward. `observed` marks real rows.
    *
    * Scale design: the calendar is built per key from a (min, max)
    * aggregate and exploded row-locally (span is bounded by the key's own
    * history — never a global calendar cross join); the fill is one
    * last-ignoreNulls window partitioned BY KEY, sharing the join's hash
    * partitioning. No leading nulls by construction (the first calendar
    * day is the first observation). */
  def gapFillForward(df: DataFrame, keyCol: String, dateCol: String,
                     valueCol: String): DataFrame = {
    val cal = df.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("_d0"), max(col(dateCol)).as("_d1"))
      .select(col(keyCol),
        explode(sequence(col("_d0"), col("_d1"), expr("INTERVAL 1 DAY")))
          .as(dateCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(df.select(col(keyCol), col(dateCol), col(valueCol)),
        Seq(keyCol, dateCol), "left")
      .withColumn("observed", col(valueCol).isNotNull)
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Trailing time-range rolling aggregates — the "spend in the last 7/30
    * days" feature every transaction- or event-keyed model consumes. For
    * each row, every `(aggExpr, name)` is evaluated over the key's rows
    * whose `orderCol` lies in `[current - lookback, current]` — a true
    * VALUE-range frame (sparse histories roll by elapsed time, not by row
    * count; a RANGE frame also makes same-instant rows peers, so ties are
    * deterministic in any engine). `orderCol` must be an integral
    * time axis (epoch day/micro) — whole-number arithmetic keeps the
    * frame bounds engine-exact.
    *
    * Scale design: ONE key-partitioned shuffle; all aggregates share the
    * same window spec, and even stacked calls with DIFFERENT lookbacks
    * over the same key+axis collapse (CollapseWindow) into a single
    * Window operator over one sort — spec-pinned in WindowsSpec. */
  def rollingRange(df: DataFrame, partitionBy: Seq[Column], orderCol: Column,
                   lookback: Long, aggs: Seq[(Column, String)]): DataFrame = {
    require(lookback >= 0, s"rollingRange: lookback must be >= 0, got $lookback")
    require(aggs.nonEmpty, "rollingRange: need at least one aggregate")
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderCol)
      .rangeBetween(-lookback, Window.currentRow)
    aggs.foldLeft(df) { case (d, (a, n)) => d.withColumn(n, a.over(w)) }
  }
}
