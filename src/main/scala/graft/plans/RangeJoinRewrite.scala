package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

/** Optimizer rule: rewrite a naive point-in-interval join into the
  * bucketed range join of [[graft.operators.RangeJoin]] — automatically.
  *
  * A user writing the obvious form
  * {{{
  * points.join(intervals,
  *   points("k") === intervals("k") &&
  *   points("ts") >= intervals("lo") && points("ts") <= intervals("hi"))
  * }}}
  * gets a `BroadcastNestedLoopJoin` (or cartesian) from Catalyst, because
  * the planner only extracts EQUI keys — the range conjuncts leave
  * nothing hashable beyond `k`, and a hot key degenerates to per-key
  * all-pairs. This rule detects the shape — at least one cross-side
  * equality, plus a lower and upper bound tying ONE timestamp from one
  * side between two timestamps from the other — and rewrites:
  * point side gains `__graft_bin = floor(us/binWidth)`, interval side
  * explodes one row per covered bin (`Sequence` + `Generate`), the join
  * becomes an ordinary hash equi-join on (keys..., bin), and the exact
  * range conjuncts (and any other residual conjuncts) move to a filter
  * above it. Correctness: a point lands in exactly one bin and an
  * interval covers each of its bins once, so the equi-join produces
  * each qualifying pair exactly once — same pair set, no distinct
  * needed; `end >= start` intervals only (a pre-filter drops reversed
  * spans, which could not match anyway).
  *
  * Run as an injected operator-optimization rule, so Catalyst's own
  * pushdown re-pushes any residual single-side conjuncts afterwards.
  * The marker attribute name prevents re-matching at fixed point (the
  * filter's range predicates can be merged back into the join
  * condition by PushDownPredicates — that join already carries the
  * bin equality and is exactly the plan we want, so it must not be
  * re-bucketed).
  *
  * Guards: inner joins only; TIMESTAMP bounds; skipped when both sides
  * stream (the stateful stream-stream form needs watermark-bounded
  * conditions INSIDE the join — see EventStreams.streamingAttribution);
  * disable with `spark.graft.rangeJoin.rewrite=false`; bin width via
  * `spark.graft.rangeJoin.binSeconds` (default 1800, same default as
  * RangeJoin.intervalJoin).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val Marker = "__graft_bin"

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangeJoin.rewrite", "true").toBoolean
  private def binUs: Long =
    conf.getConfString("spark.graft.rangeJoin.binSeconds", "1800").toLong * 1000000L

  /** floor(unix_micros(ts) / binUs) — the same (double-division) binning
    * expression RangeJoin.intervalJoin builds through the Column API.
    */
  private def binOf(ts: Expression): Expression =
    Cast(Floor(Divide(
      Cast(UnixMicros(ts), DoubleType), Literal(binUs.toDouble))), LongType)

  private case class Shape(
      equalities: Seq[Expression], ts: Expression,
      lo: Expression, hi: Expression, residual: Seq[Expression],
      pointsLeft: Boolean)

  /** Extract the range-join shape with the point side identified, or None. */
  private def matchShape(cond: Expression, left: LogicalPlan,
                         right: LogicalPlan): Option[Shape] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.exists(_.references.exists(_.name.startsWith(Marker))))
      return None // already rewritten; bounds merged back are fine as-is
    def sideOf(e: Expression): Option[Boolean] = // Some(true)=left only
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None
    val equalities = conjuncts.filter {
      case EqualTo(a, b) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }
    if (equalities.isEmpty) return None
    // normalize bounds to (ts >= lo) / (ts <= hi) candidate pairs
    def asLower(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(t, l) => Some((t, l))
      case LessThanOrEqual(l, t) => Some((t, l))
      case _ => None
    }
    def asUpper(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(t, h) => Some((t, h))
      case GreaterThanOrEqual(h, t) => Some((t, h))
      case _ => None
    }
    val rest = conjuncts.filterNot(equalities.contains)
    val lowers = rest.flatMap(c => asLower(c).map(c -> _))
    val uppers = rest.flatMap(c => asUpper(c).map(c -> _))
    // find a (lower, upper) pair over the same cross-side ts expression
    val hit = (for {
      (lc, (ts1, lo)) <- lowers.iterator
      (uc, (ts2, hi)) <- uppers.iterator
      if lc != uc && ts1.semanticEquals(ts2)
      if ts1.dataType == TimestampType &&
        lo.dataType == TimestampType && hi.dataType == TimestampType
      tsSide <- sideOf(ts1); loSide <- sideOf(lo); hiSide <- sideOf(hi)
      if loSide == hiSide && tsSide != loSide
    } yield (lc, uc, ts1, lo, hi, tsSide)).buffered.headOption
    hit.map { case (lc, uc, ts, lo, hi, tsSide) =>
      Shape(equalities, ts, lo, hi,
        rest.filterNot(c => c == lc || c == uc), tsSide)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !(left.isStreaming && right.isStreaming) =>
        matchShape(cond, left, right) match {
          case None => j
          case Some(s) =>
            val (points, intervals) =
              if (s.pointsLeft) (left, right) else (right, left)
            // point side: one bin column
            val pBin = Alias(binOf(s.ts), s"${Marker}_p")()
            val pointsB = Project(points.output :+ pBin, points)
            // interval side: drop reversed spans, explode covered bins
            val ivFiltered =
              Filter(GreaterThanOrEqual(s.hi, s.lo), intervals)
            val seq = Sequence(
              binOf(s.lo), binOf(s.hi), None, Some(conf.sessionLocalTimeZone))
            val iBinAttr = AttributeReference(s"${Marker}_i", LongType,
              nullable = false)()
            val intervalsB = Generate(Explode(seq), Nil, outer = false,
              qualifier = None, generatorOutput = Seq(iBinAttr), ivFiltered)
            val binEq = EqualTo(pBin.toAttribute, iBinAttr)
            val newCond = (s.equalities :+ binEq).reduce(And)
            val (newLeft, newRight) =
              if (s.pointsLeft) (pointsB, intervalsB) else (intervalsB, pointsB)
            val joined = Join(newLeft, newRight, Inner, Some(newCond), hint)
            val post = (Seq(
              GreaterThanOrEqual(s.ts, s.lo), LessThanOrEqual(s.ts, s.hi))
              ++ s.residual).reduce(And)
            Project(j.output, Filter(post, joined))
        }
    }
  }
}
