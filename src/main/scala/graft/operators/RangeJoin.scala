package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join without a cartesian product.
  *
  * Spark plans a bare `p.ts BETWEEN i.start AND i.end` join as a
  * BroadcastNestedLoop (or worse, a cartesian) — every point against every
  * interval. The scale-right plan quantizes time into fixed-width bins:
  * each interval explodes to the bins it covers (bounded, usually 1-2),
  * each point maps to exactly one bin, the join becomes an EQUI-join on the
  * bin, and the exact half-open predicate `start <= ts < end` filters the
  * candidates. Shuffle volume is |points| + |intervals|·spannedBins instead
  * of |points|·|intervals|.
  *
  * Pick `binMicros` near the typical interval length: wider bins mean fewer
  * interval replicas but more candidates per point; narrower the reverse.
  */
object RangeJoin {

  /** Derive the bin width FROM the interval-length distribution instead of
    * trusting a caller's guess: the `quantileBp` quantile (default p90) of
    * `endUs - startUs`, via the histogram-walk posture
    * ([[Profile.exactQuantiles]]'s steps 1-3): ONE (min, max, count)
    * aggregate + ONE bounded histogram collect (`granularity`+1 buckets,
    * metadata-scale), no sort. Returns the target bucket's UPPER edge —
    * deliberately rounding the quantile UP, so at least `quantileBp` of
    * intervals replicate to <= 2 bins.
    *
    * Why p90 and not the mean or max: a long-tail distribution (mostly
    * minutes, a few multi-hour stragglers) pulls the mean up and the max
    * way up — a max-derived width makes every point's bin huge (candidate
    * explosion), while a mean/median-derived width makes the tail
    * intervals replicate hundreds of times. p90 bounds BOTH: the bulk
    * stays at <= 2 replicas and only the 10% tail pays proportional
    * replication. Inputs are microsecond longs; zero/negative lengths are
    * ignored (inverted intervals match nothing anyway); an empty input
    * falls back to one hour. */
  def autoBinMicros(intervals: DataFrame, startUs: Column, endUs: Column,
                    quantileBp: Int = 9000, granularity: Int = 1000): Long = {
    require(quantileBp >= 1 && quantileBp <= 10000,
      s"autoBinMicros: quantileBp in [1,10000], got $quantileBp")
    require(granularity >= 1, s"autoBinMicros: granularity must be >= 1")
    val lens = intervals
      .select((endUs.cast("long") - startUs.cast("long")).as("_len"))
      .filter(col("_len").isNotNull && col("_len") > 0)
    val stats = lens.agg(min(col("_len")), max(col("_len")), count(lit(1))).head()
    if (stats.isNullAt(0)) return 3600L * 1000000L // empty: one hour
    val (mn, mx, n) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    val width = math.max(1L, (mx - mn) / granularity + 1)
    val hist = lens.selectExpr(s"(_len - ${mn}L) DIV ${width}L AS _b")
      .groupBy(col("_b")).agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val rk = (quantileBp.toLong * n + 9999L) / 10000L // ceil, integer-exact
    var cum = 0L
    val bucket = hist.iterator.map { case (b, c) => cum += c; (b, cum) }
      .find(_._2 >= rk).map(_._1).get // rk <= n, always found
    math.max(1L, mn + (bucket + 1) * width)
  }

  /** [[pointInInterval]] with the bin width self-derived from the interval
    * distribution ([[autoBinMicros]]) — the form pipelines should default
    * to: a skewed interval mix cannot blow up replica counts through a
    * stale hand-tuned constant. */
  def pointInIntervalAuto(points: DataFrame, ptTs: String,
                          intervals: DataFrame, startTs: String,
                          endTs: String): DataFrame =
    pointInInterval(points, ptTs, intervals, startTs, endTs,
      autoBinMicros(intervals, unix_micros(col(startTs)), unix_micros(col(endTs))))

  /** [[intervalOverlap]] with the bin width self-derived from BOTH sides'
    * interval lengths (the union drives the quantile, so whichever side
    * carries the tail bounds the replication). */
  def intervalOverlapAuto(a: DataFrame, aStartUs: String, aEndUs: String,
                          b: DataFrame, bStartUs: String,
                          bEndUs: String): DataFrame = {
    val lens = a.select(col(aStartUs).as("_s"), col(aEndUs).as("_e"))
      .unionByName(b.select(col(bStartUs).as("_s"), col(bEndUs).as("_e")))
    intervalOverlap(a, aStartUs, aEndUs, b, bStartUs, bEndUs,
      autoBinMicros(lens, col("_s"), col("_e")))
  }

  def pointInInterval(points: DataFrame, ptTs: String,
                      intervals: DataFrame, startTs: String, endTs: String,
                      binMicros: Long): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val p = points.withColumn("_bin", (unix_micros(col(ptTs)) / binMicros).cast("long"))
    val i = intervals.withColumn("_bin",
      explode(sequence(
        (unix_micros(col(startTs)) / binMicros).cast("long"),
        (unix_micros(col(endTs)) / binMicros).cast("long"))))
    p.join(i, Seq("_bin"))
      .filter(col(ptTs) >= col(startTs) && col(ptTs) < col(endTs))
      .drop("_bin")
  }

  /** Interval-OVERLAP join (both sides are ranges, CLOSED endpoints:
    * overlap iff aStart <= bEnd AND bStart <= aEnd) without a cartesian
    * and without a dedup pass.
    *
    * Both sides explode to the time bins they cover and meet in an
    * EQUI-join on the bin; the exact predicate filters non-overlaps. An
    * overlapping pair shares EVERY bin its intersection covers, so the
    * naive bin join emits it once per shared bin — the classic fix is a
    * `distinct` over the pair keys, which is a second full shuffle. The
    * CANONICAL-BIN condition removes it for free: keep a pair only in the
    * bin containing `greatest(aStart, bStart)` — the first instant both
    * intervals are live. That bin is covered by both explode ranges
    * whenever the pair overlaps (max-of-starts <= both ends), so each
    * overlapping pair survives in EXACTLY one bin: uniqueness is a
    * row-local filter, not a shuffle.
    *
    * Column names must be disjoint between `a` and `b` (alias first).
    * Inputs are microsecond longs, integer-divided (`div`) into bins so
    * boundary arithmetic is exact. Pick `binMicros` near the typical
    * interval length, as in [[pointInInterval]]. */
  def intervalOverlap(a: DataFrame, aStartUs: String, aEndUs: String,
                      b: DataFrame, bStartUs: String, bEndUs: String,
                      binMicros: Long): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val ae = a.withColumn("_bin", explode(sequence(
      expr(s"$aStartUs div $binMicros"), expr(s"$aEndUs div $binMicros"))))
    val be = b.withColumn("_bin", explode(sequence(
      expr(s"$bStartUs div $binMicros"), expr(s"$bEndUs div $binMicros"))))
    ae.join(be, Seq("_bin"))
      .filter(col(aStartUs) <= col(bEndUs) && col(bStartUs) <= col(aEndUs))
      .filter(col("_bin") === expr(s"greatest($aStartUs, $bStartUs) div $binMicros"))
      .drop("_bin")
  }
}
