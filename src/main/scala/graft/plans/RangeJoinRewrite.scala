package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: rewrite a pure range (point-in-interval) join into the
  * binned equi-join [[graft.operators.RangeJoin]] spells out by hand.
  *
  * Spark plans `points JOIN intervals ON ts >= lo AND ts < hi` as a
  * BroadcastNestedLoopJoin — every point against every interval — because
  * no equality key exists. That shape is the single most common
  * accidental O(n·m) in event analytics. The rewrite is
  * semantics-preserving for ANY bin width, so it is safe as an automatic
  * optimization (this is what commercial engines ship as their
  * "range join optimization"):
  *
  *  - points project an extra `unix_micros(ts) div W` bin column;
  *  - intervals `Generate`-explode to the bins they cover
  *    (`sequence(lo div W, hi div W)` — bounded by interval/W);
  *  - the join becomes an EQUI-join on the bin;
  *  - the ORIGINAL predicate re-applies as a residual filter, so false
  *    bin-mates, inverted intervals (lo > hi) and null endpoints all
  *    resolve exactly as the nested loop would have resolved them.
  *
  * The match is deliberately conservative: INNER joins whose whole
  * condition is exactly `ts >= lo AND ts < hi` (timestamps, each side of
  * the comparison from opposite join sides, no join hints). Joins that
  * already carry an equality key plan as hash joins and never reach the
  * pattern; hinted joins are left to the hint.
  *
  * Bin width comes from `spark.graft.rangeJoin.binSeconds` (default 3600);
  * correctness never depends on it — only the replicate factor does.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val BinSecondsKey = "spark.graft.rangeJoin.binSeconds"

  private def binMicros: Long = {
    val secs = conf.getConfString(BinSecondsKey, "3600").toLong
    require(secs > 0, s"$BinSecondsKey must be positive, got $secs")
    secs * 1000000L
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(_, _, Inner, Some(cond), hint)
        if hint == JoinHint.NONE =>
      matchRange(cond, j) match {
        case Some((pt, lo, hi)) => rewrite(j, pt, lo, hi)
        case None => j
      }
  }

  /** `pt >= lo AND pt < hi`, all TimestampType attributes, `pt` from one
    * join side and `lo`/`hi` both from the other. */
  private def matchRange(cond: Expression, j: Join)
      : Option[(Attribute, Attribute, Attribute)] = cond match {
    case And(GreaterThanOrEqual(a: AttributeReference, b: AttributeReference),
             LessThan(a2: AttributeReference, c: AttributeReference))
        if a.semanticEquals(a2) &&
           Seq(a, b, c).forall(_.dataType == TimestampType) =>
      val (l, r) = (j.left.outputSet, j.right.outputSet)
      val ok = (l.contains(a) && r.contains(b) && r.contains(c)) ||
        (r.contains(a) && l.contains(b) && l.contains(c))
      if (ok) Some((a, b, c)) else None
    case _ => None
  }

  private def bin(ts: Expression): Expression =
    IntegralDivide(UnixMicros(ts), Literal(binMicros))

  private def rewrite(j: Join, pt: Attribute, lo: Attribute, hi: Attribute): LogicalPlan = {
    val (ptSide, intSide) =
      if (j.left.outputSet.contains(pt)) (j.left, j.right) else (j.right, j.left)
    val pAlias = Alias(bin(pt), "_graft_bin_p")()
    val pProj = Project(ptSide.output :+ pAlias, ptSide)
    val seq = Sequence(bin(lo), bin(hi), None, Some(conf.sessionLocalTimeZone))
    val iBin = AttributeReference("_graft_bin_i", LongType, nullable = false)()
    val gen = Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(iBin), child = intSide)
    val joined = Join(pProj, gen, Inner,
      Some(EqualTo(pAlias.toAttribute, iBin)), JoinHint.NONE)
    // the original predicate re-applies: bin co-residence is necessary but
    // not sufficient, and it is what keeps the rewrite exact
    Project(j.output, Filter(j.condition.get, joined))
  }
}

/** Installation hook for an already-running session (the
  * [[graft.Functions.register]] twin for optimizer rules). Idempotent. */
object GraftRules {
  def install(spark: SparkSession): Unit = {
    val want = Seq(RangeJoinRewrite, IntervalJoinRewrite)
    val cur = spark.experimental.extraOptimizations
    val add = want.filterNot(cur.contains)
    if (add.nonEmpty) spark.experimental.extraOptimizations = cur ++ add
  }

  /** Derive the rewrite rules' bin width FROM the interval data and pin it
    * into the session conf the rules read. An optimizer rule must not run
    * jobs, so the derivation is a caller step (run it once per interval
    * table, at layout/registration time — the same cadence as computing
    * table statistics): the p90 interval length via the bounded
    * histogram-walk ([[graft.operators.RangeJoin.autoBinMicros]]), rounded
    * UP to whole seconds. Correctness never depends on the value — only
    * replica counts do — so a stale setting degrades, never breaks.
    * Returns the seconds it set. */
  def autoTuneBinSeconds(spark: SparkSession,
                         intervals: org.apache.spark.sql.DataFrame,
                         startTs: String, endTs: String): Long = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val micros = graft.operators.RangeJoin.autoBinMicros(
      intervals, unix_micros(col(startTs)), unix_micros(col(endTs)))
    val secs = math.max(1L, (micros + 999999L) / 1000000L)
    // IntervalJoinRewrite reads the same key
    spark.conf.set(RangeJoinRewrite.BinSecondsKey, secs.toString)
    secs
  }
}
