package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a two-sided INTERVAL-OVERLAP inner join into the
  * binned equi-join [[graft.operators.RangeJoin.intervalOverlap]] spells
  * out by hand — the [[RangeJoinRewrite]] sibling for the
  * `aStart <= bEnd AND bStart <= aEnd` pattern (incident correlation,
  * session-vs-outage attribution, any two interval sets).
  *
  * Spark plans the naive overlap join as a nested loop (no equality key).
  * The rewrite: BOTH sides `Generate`-explode to the bins their interval
  * covers, the join becomes an equi-join on the bin, the ORIGINAL
  * predicate re-applies as a residual, and the CANONICAL-BIN filter
  * (keep a pair only in the bin of max-of-starts — a bin both sides cover
  * whenever they overlap) restores exactly-once pair emission without a
  * pair-keyed distinct shuffle. Exactness holds for every edge the naive
  * join resolves:
  *
  *  - null endpoint: the `sequence` is null, `Explode` emits nothing —
  *    and the naive predicate is null for that row too;
  *  - inverted interval (start > end): `sequence` steps down, covering
  *    the same bin SET; the only pairs the naive join admits have the
  *    canonical bin inside both sets (if b starts after an inverted a's
  *    start, `bStart <= aEnd < aStart` is unsatisfiable);
  *  - boundary-touching intervals: `<=` both sides, carried verbatim by
  *    the residual.
  *
  * Conservative match: INNER join, no hints, condition EXACTLY two
  * `<=` comparisons, all four endpoints LongType attributes (the
  * epoch-micros convention of the hand-built operator), each comparison
  * crossing join sides with starts and ends correctly paired. Bin width
  * shares [[RangeJoinRewrite.BinSecondsKey]] — correctness never depends
  * on it, only the explode replicate factor does.
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] {

  private def binMicros: Long = {
    val secs = conf.getConfString(RangeJoinRewrite.BinSecondsKey, "3600").toLong
    require(secs > 0, s"${RangeJoinRewrite.BinSecondsKey} must be positive, got $secs")
    secs * 1000000L
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(_, _, Inner, Some(cond), hint)
        if hint == JoinHint.NONE =>
      matchOverlap(cond, j) match {
        case Some((aS, aE, bS, bE)) => rewrite(j, aS, aE, bS, bE)
        case None => j
      }
  }

  /** `aStart <= bEnd AND bStart <= aEnd`, all LongType attributes, with
    * (aStart, aEnd) on one join side and (bStart, bEnd) on the other.
    * Returns (aStart, aEnd, bStart, bEnd) with the a-pair from whichever
    * side it lives on. The pattern is symmetric under conjunct order (a
    * swap just relabels the sides). */
  private def matchOverlap(cond: Expression, j: Join)
      : Option[(Attribute, Attribute, Attribute, Attribute)] = cond match {
    case And(LessThanOrEqual(aS: AttributeReference, bE: AttributeReference),
             LessThanOrEqual(bS: AttributeReference, aE: AttributeReference))
        if Seq(aS, aE, bS, bE).forall(_.dataType == LongType) =>
      val (l, r) = (j.left.outputSet, j.right.outputSet)
      // aS pairs with aE on one side; bS with bE on the other
      val ok = (l.contains(aS) && l.contains(aE) && r.contains(bS) && r.contains(bE)) ||
        (r.contains(aS) && r.contains(aE) && l.contains(bS) && l.contains(bE))
      if (ok) Some((aS, aE, bS, bE)) else None
    case _ => None
  }

  private def bin(us: Expression): Expression =
    IntegralDivide(us, Literal(binMicros))

  private def explodeBins(side: LogicalPlan, start: Attribute, end: Attribute,
                          name: String): (LogicalPlan, Attribute) = {
    val seq = Sequence(bin(start), bin(end), None, Some(conf.sessionLocalTimeZone))
    val out = AttributeReference(name, LongType, nullable = false)()
    (Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(out), child = side), out)
  }

  private def rewrite(j: Join, aS: Attribute, aE: Attribute,
                      bS: Attribute, bE: Attribute): LogicalPlan = {
    val aOnLeft = j.left.outputSet.contains(aS)
    val (aSide, bSide) = if (aOnLeft) (j.left, j.right) else (j.right, j.left)
    val (aGen, aBin) = explodeBins(aSide, aS, aE, "_graft_ibin_a")
    val (bGen, bBin) = explodeBins(bSide, bS, bE, "_graft_ibin_b")
    val (lGen, rGen) = if (aOnLeft) (aGen, bGen) else (bGen, aGen)
    val joined = Join(lGen, rGen, Inner,
      Some(EqualTo(aBin, bBin)), JoinHint.NONE)
    // residual: bin co-residence is necessary, the original predicate is
    // what decides; canonical bin restores exactly-once pair emission
    val canonical = EqualTo(aBin, bin(Greatest(Seq(aS, bS))))
    Project(j.output, Filter(And(j.condition.get, canonical), joined))
  }
}
