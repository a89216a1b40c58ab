package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a pure RANGE join (point-in-interval, no equi
  * keys — which Spark can only plan as a broadcast-nested-loop: every
  * point row compared against EVERY interval) into the bin-bucketed
  * equi-join `join_range_binned` builds by hand:
  *
  *   points ⋈ [v >= lo && v < hi]  intervals
  *     ⇒ points+bin(v)  ⋈ [binEq && original-cond]  intervals×bins(lo..hi)
  *
  * Each interval explodes into the ⌈len/w⌉+1 bins it covers, the join
  * becomes a hash join on the bin key, and the ORIGINAL range condition
  * rides along as the residual — so the rewrite can never change results,
  * only the join strategy (the WarehouseZoneMap transparency discipline
  * applied to a plan rewrite). At 100 TB this is the difference between
  * O(points × intervals) comparisons and O(points + intervals × bins/len)
  * hash probes.
  *
  * Like production range-join rules, the bin width is a user hint — no
  * plan-time statistics can pick it: set `spark.graft.rangeJoin.binSize`
  * (a positive double) to enable; unset = rule inert. A malformed or
  * non-positive value is logged and IGNORED (rule stays inert) rather
  * than thrown: the rule is installed session-wide, so a bad hint must
  * not fail unrelated queries mid-optimization. Fires only on an
  * INNER join whose condition contains a lower AND an upper bound on the
  * same point expression against the same interval side, with no equi
  * conjunct (if one exists the join already hash-plans). Idempotent by
  * construction: the rewritten join HAS an equi conjunct.
  *
  * Failure mode to size the hint against: each interval explodes into
  * ⌈len/w⌉+1 bin rows, so a width tiny relative to the interval lengths
  * multiplies the build side accordingly — and past ~2³¹ bins for ONE
  * interval Spark's `Sequence` would fail with its opaque
  * max-array-length error (or silently blow executor memory well before
  * that). The rewrite therefore guards every generated sequence: an
  * interval spanning more than `spark.graft.rangeJoin.maxBinsPerInterval`
  * bins (default 2²² ≈ 4.2M) fails AT RUNTIME with a clear message naming
  * both confs, instead of OOM-ing or erroring opaquely. A reversed
  * interval (lo > hi) would explode into the descending bin sequence —
  * semantically harmless (the original condition rides along as the
  * residual and is unsatisfiable for it) but just as unbounded, so the
  * guard is on |span|. Pick w within a few orders of magnitude of the
  * median interval length; the `join_range_binned` query and
  * RangeBinJoinSpec document the working shape.
  */
object RangeBinJoin extends Rule[LogicalPlan] {
  val BinSizeKey = "spark.graft.rangeJoin.binSize"
  val MaxBinsKey = "spark.graft.rangeJoin.maxBinsPerInterval"
  val MaxBinsDefault = 1L << 22

  private def sideOf(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  /** Both readings of a cross-side comparison conjunct, as
    * (point, pointSideIsLeft, bound, boundIsUpper): `a < b` says b has
    * lower bound a AND a has upper bound b — which expression is "the
    * point" is decided later by whichever side accumulates both a lower
    * and an upper bound. */
  private def asBounds(c: Expression, l: LogicalPlan, r: LogicalPlan)
      : Seq[(Expression, Boolean, Expression, Boolean)] = {
    def mk(a: Expression, b: Expression) = // semantics: a ≤/< b
      (sideOf(a, l, r), sideOf(b, l, r)) match {
        case (Some(sa), Some(sb)) if sa != sb =>
          Seq((b, sb, a, false), (a, sa, b, true))
        case _ => Nil
      }
    c match {
      case LessThan(a, b) => mk(a, b)
      case LessThanOrEqual(a, b) => mk(a, b)
      case GreaterThan(a, b) => mk(b, a)
      case GreaterThanOrEqual(a, b) => mk(b, a)
      case _ => Nil
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val wStr = conf.getConfString(BinSizeKey, "")
    if (wStr.isEmpty) return plan
    // Parse defensively: the rule runs on EVERY query in the session, so a
    // malformed/non-positive hint must leave plans untouched, not throw.
    val binW = try wStr.toDouble catch { case _: NumberFormatException =>
      logWarning(s"$BinSizeKey='$wStr' is not a number; rule inert")
      return plan
    }
    if (!(binW > 0) || binW.isInfinite) { // !(>0) also catches NaN
      logWarning(s"$BinSizeKey='$wStr' must be a positive finite double; " +
        "rule inert")
      return plan
    }
    // Same defensive-parse discipline for the bin-count cap.
    val maxBinsStr = conf.getConfString(MaxBinsKey, MaxBinsDefault.toString)
    val maxBins = try maxBinsStr.toLong catch { case _: NumberFormatException =>
      logWarning(s"$MaxBinsKey='$maxBinsStr' is not a long; rule inert")
      return plan
    }
    if (maxBins <= 0) {
      logWarning(s"$MaxBinsKey='$maxBinsStr' must be positive; rule inert")
      return plan
    }

    plan transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjuncts(cond)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) =>
            (sideOf(a, left, right), sideOf(b, left, right)) match {
              case (Some(sa), Some(sb)) => sa != sb
              case _ => false
            }
          case _ => false
        }
        val bounds = conjuncts.flatMap(asBounds(_, left, right))
        // one point expression bounded below AND above by the OTHER side,
        // all numeric and deterministic
        val candidate = bounds.groupBy { case (pt, side, _, _) =>
          (pt.canonicalized, side)
        }.collectFirst {
          case ((_, ptLeft), bs)
            if bs.exists(b => !b._4) && bs.exists(b => b._4) &&
              bs.forall(b => b._1.dataType.isInstanceOf[
                org.apache.spark.sql.types.NumericType] &&
                b._3.dataType.isInstanceOf[
                  org.apache.spark.sql.types.NumericType] &&
                b._1.deterministic && b._3.deterministic) =>
            val pt = bs.head._1
            val lo = bs.find(b => !b._4).get._3 // bound ≤ point: lower edge
            val hi = bs.find(b => b._4).get._3 // point ≤ bound: upper edge
            (pt, ptLeft, lo, hi)
        }
        (if (hasEqui) None else candidate) match {
          case None => j
          case Some((pt, ptLeft, lo, hi)) =>
            def binOf(e: Expression): Expression =
              Cast(Floor(Divide(Cast(e, DoubleType), Literal(binW))),
                LongType)
            val (probe, build) = if (ptLeft) (left, right) else (right, left)
            val probeBin = Alias(binOf(pt), "graft_range_bin")()
            val probe2 = Project(probe.output :+ probeBin, probe)
            val genOut = AttributeReference("graft_range_bin_g",
              LongType, nullable = false)()
            // Per-interval bin-count guard (|binHi-binLo|+1 ≤ maxBins):
            // a hint width tiny relative to one interval's length must
            // fail loudly with both conf names, not OOM or hit Sequence's
            // opaque max-array error. Null-safe: a null span (null lo/hi
            // bound) falls through to the null Sequence, which outer=false
            // explode drops — exactly the un-guarded behavior.
            val binLo = binOf(lo)
            val binHi = binOf(hi)
            val span = Subtract(binHi, binLo)
            val guardedHi = If(
              Or(IsNull(span),
                LessThanOrEqual(Abs(span), Literal(maxBins - 1L))),
              binHi,
              Cast(RaiseError(Literal(
                s"graft range-join binning: an interval spans more than " +
                  s"$maxBins bins at $BinSizeKey=$binW; raise the bin " +
                  s"width (or $MaxBinsKey) so intervals cover a bounded " +
                  "bin count")), LongType))
            val build2 = Generate(
              Explode(Sequence(binLo, guardedHi, None,
                Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(genOut), child = build)
            val newCond = And(
              EqualTo(probeBin.toAttribute, genOut), cond)
            val (l2, r2) = if (ptLeft) (probe2, build2) else (build2, probe2)
            Project(j.output, Join(l2, r2, Inner, Some(newCond), hint))
        }
    }
  }
}
