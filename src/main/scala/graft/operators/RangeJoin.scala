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
}
