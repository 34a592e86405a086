package graft.operators

import org.apache.spark.sql.DataFrame
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
