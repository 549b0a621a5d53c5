package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrites a pure range-condition inner join
  * (`lo <= p AND p <= hi` with no equi predicate between the sides)
  * into the binned equi-join ops.RangeJoin spells by hand — the
  * planner-level automation of the same trick, registered via
  * `graft.GraftExtensions` (`spark.sql.extensions=graft.GraftExtensions`)
  * or `spark.experimental.extraOptimizations`.
  *
  * Without it Spark plans a non-equi inner join as
  * BroadcastNestedLoopJoin (broadcast-bound build side, O(n·m) probe)
  * or a cartesian product — the two shapes that cannot scale. The
  * rewrite: bin the point side once (`⌊p/W⌋`), explode the interval
  * side into its overlapped bins (`sequence(⌊lo/W⌋, ⌊hi/W⌋)`), join on
  * bin EQUALITY, and keep the ORIGINAL condition as the residual — so
  * the result is exactly the naive join's for any bin width.
  *
  * Correctness argument: `x ↦ ⌊cast(x, double)/W⌋` is monotonically
  * non-decreasing for every numeric input type, so p ∈ [lo, hi] ⇒
  * bin(p) ∈ [bin(lo), bin(hi)] — every qualifying pair shares a bin
  * (candidate generation is a superset; the residual filter is exact).
  * NULL points/bounds produce NULL bins / NULL sequences and drop, as
  * they do under the original comparison. Strict bounds (`<`, `>`) are
  * accepted for candidate generation (a superset of the inclusive
  * window) and enforced by the residual. A lo > hi interval generates
  * its (empty-result) bins and is removed by the residual — a perf
  * corner, not a correctness one.
  *
  * Scope guards:
  *  - inner joins only (outer variants change unmatched-row semantics);
  *  - skipped when ANY cross-side equi predicate exists (the planner
  *    can already hash-partition on it — binning would only add work);
  *  - point and both bounds must be numeric and each fully resolvable
  *    to one side;
  *  - fixpoint-safe: the rewritten join contains a cross-side equi
  *    predicate (the bin key), so the rule skips its own output.
  *
  * Bin width comes from `spark.graft.rangeJoin.binWidth` (default 100;
  * width only shifts the replicas-vs-candidates balance, never the
  * result — RangeJoinSpec/RangeJoinRewriteSpec assert invariance);
  * `spark.graft.rangeJoin.enabled=false` turns the rule off.
  *
  * Replication bound: an interval that is enormous relative to the bin
  * width (epoch-micros against the default width, or a ±Infinity
  * bound whose floor clamps to ±Long.MaxValue) would ask `sequence`
  * for millions-to-billions of bins PER ROW — the rewrite would turn a
  * working (slow) nested-loop query into an OOM/array-size failure.
  * The injected generator therefore guards each row: if the interval
  * spans ≥ `spark.graft.rangeJoin.maxBinsPerRow` bins (default 10k,
  * parsed fail-safe like binWidth), the row raises a loud, actionable
  * error (raise bin width, raise the cap, or disable the rule) instead
  * of materializing the array. The span test runs on the RAW bounds in
  * double space BEFORE any floor, so non-finite bounds hit the guard,
  * never `sequence`. NaN bounds follow Spark's NaN-is-largest
  * comparison ordering: a NaN lower bound matches nothing (empty bin
  * array), a NaN upper bound means "everything ≥ lo" and errors like
  * ±Infinity does.
  */
case class RangeJoinRewrite() extends Rule[LogicalPlan] with PredicateHelper {

  // an invalid width (non-numeric, zero, negative, non-finite) must
  // DISABLE the rewrite, never apply it: dividing by 0 would produce
  // NULL bins and silently drop every result row — a misconfiguration
  // must degrade to the planner's own (slow, correct) strategy
  private def binWidth: Option[Double] =
    scala.util.Try(
      conf.getConfString("spark.graft.rangeJoin.binWidth", "100.0").toDouble)
      .toOption.filter(w => w > 0 && java.lang.Double.isFinite(w))
  // same fail-safe posture as binWidth: an unparseable flag value must
  // disable the rule (one bad conf string must not break every query
  // in the session with a parse exception thrown mid-optimization)
  private def enabled: Boolean =
    scala.util.Try(
      conf.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean)
      .getOrElse(false)

  private def maxBinsPerRow: Double =
    scala.util.Try(
      conf.getConfString("spark.graft.rangeJoin.maxBinsPerRow", "10000").toDouble)
      .toOption.filter(m => m > 0 && java.lang.Double.isFinite(m))
      .getOrElse(10000.0)

  /** (point, bound) candidate where both sit purely on opposite sides. */
  private case class Bound(point: Expression, bound: Expression,
      pointOnLeft: Boolean, isLower: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || binWidth.isEmpty) return plan
    plan.transform {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewrite(j).getOrElse(j)
    }
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), hint) = j
    def side(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None
    def numeric(e: Expression): Boolean = e.dataType.isInstanceOf[NumericType]
    // non-deterministic operands are excluded (defense-in-depth: the
    // analyzer already rejects non-deterministic join conditions, but
    // this rule must never rely on that — it duplicates the point and
    // bound expressions into the bin projection, which would change
    // semantics for a rand()-bearing condition evaluated once per row
    // pair in the naive join)
    def cand(p: Expression, b: Expression, isLower: Boolean): Seq[Bound] =
      (side(p), side(b)) match {
        case (Some(ps), Some(bs)) if ps != bs && numeric(p) && numeric(b) &&
            p.deterministic && b.deterministic =>
          Seq(Bound(p, b, ps, isLower))
        case _ => Nil
      }

    val conjuncts = splitConjunctivePredicates(cond)
    val hasCrossEqui = conjuncts.exists {
      case EqualTo(a, b) => side(a).isDefined && side(b).isDefined &&
        side(a) != side(b)
      case EqualNullSafe(a, b) => side(a).isDefined && side(b).isDefined &&
        side(a) != side(b)
      case _ => false
    }
    if (hasCrossEqui) return None

    // normalize every comparison into its two readings: `a >= b` is
    // "a has lower bound b" AND "b has upper bound a"
    val bounds = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) => cand(a, b, isLower = true) ++
        cand(b, a, isLower = false)
      case GreaterThan(a, b) => cand(a, b, isLower = true) ++
        cand(b, a, isLower = false)
      case LessThanOrEqual(a, b) => cand(a, b, isLower = false) ++
        cand(b, a, isLower = true)
      case LessThan(a, b) => cand(a, b, isLower = false) ++
        cand(b, a, isLower = true)
      case _ => Nil
    }
    val pair = bounds.collectFirst {
      case lo if lo.isLower && bounds.exists(hi => !hi.isLower &&
          hi.point.semanticEquals(lo.point)) =>
        (lo, bounds.find(hi => !hi.isLower &&
          hi.point.semanticEquals(lo.point)).get)
    }
    pair.map { case (lo, hi) =>
      val w = Literal(binWidth.get, DoubleType)
      def bin(e: Expression): Expression = Floor(Divide(Cast(e, DoubleType), w))
      val (pPlan, iPlan) = if (lo.pointOnLeft) (left, right) else (right, left)
      val pAlias = Alias(bin(lo.point), "__graft_bin_p")()
      val pProj = Project(pPlan.output :+ pAlias, pPlan)
      val binAttr = AttributeReference("__graft_bin_i", LongType,
        nullable = false)()
      // Per-row replication guard, evaluated on the RAW bounds in
      // double space (never overflows, and catches ±Infinity before
      // floor clamps it to ±Long.MaxValue). Three-way branch:
      //  - lo = NaN: the interval matches nothing under Spark's
      //    NaN-is-largest ordering (p >= NaN is false for every p) →
      //    empty bin array, exactly the naive join's output;
      //  - |span| >= cap, or span = NaN (a NaN/±Inf hi — which under
      //    NaN-is-largest ordering means "matches everything ≥ lo" and
      //    is un-binnable; NOTE the unguarded rewrite would have binned
      //    NaN to 0 and silently DROPPED those matches): loud error
      //    instead of asking sequence() for an enormous array. The abs
      //    catches descending (lo > hi) spans too, where Sequence's
      //    implicit step -1 would replicate just as unboundedly;
      //  - else: the bounded sequence. NULL bounds make every predicate
      //    NULL (If takes the else branch), where the NULL bound yields
      //    a NULL sequence that generates no rows — naive semantics.
      val spanBins = Divide(
        Subtract(Cast(hi.bound, DoubleType), Cast(lo.bound, DoubleType)), w)
      val seq = new Sequence(bin(lo.bound), bin(hi.bound), None,
        Some(conf.sessionLocalTimeZone))
      val bad = Or(IsNaN(spanBins),
        GreaterThanOrEqual(Abs(spanBins), Literal(maxBinsPerRow)))
      val guarded = If(IsNaN(Cast(lo.bound, DoubleType)),
        Literal.create(Array.empty[Long], seq.dataType),
        If(bad,
          Cast(new RaiseError(Literal(
            s"graft range-join rewrite: an interval spans >= $maxBinsPerRow " +
              s"bins at binWidth ${binWidth.get} (non-finite or enormous " +
              "bounds). Raise spark.graft.rangeJoin.binWidth, raise " +
              "spark.graft.rangeJoin.maxBinsPerRow, or set " +
              "spark.graft.rangeJoin.enabled=false to fall back to the " +
              "planner's nested-loop strategy.")), seq.dataType),
          seq))
      val gen = Generate(
        Explode(guarded),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(binAttr), child = iPlan)
      val (nl, nr) = if (lo.pointOnLeft) (pProj, gen) else (gen, pProj)
      val newCond = And(EqualTo(pAlias.toAttribute, binAttr), cond)
      Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
    }
  }
}
