package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a pure non-equi range join into a banded
  * equi-join at plan time.
  *
  * An inner join whose only cross-side predicate is range containment
  * (`lo <= p AND p <= hi`, point from one side, bounds from the other)
  * has no equality key, so Spark plans BroadcastNestedLoopJoin —
  * O(n·m) compares and a full broadcast of one side. This rule
  * manufactures the key the planner needs: both sides gain a band id
  * (`p div w` resp. one exploded row per band in `[lo div w, hi div
  * w]`), the join becomes an ordinary hash join on the band plus the
  * original predicate re-checked band-locally, and a final projection
  * drops the bands. Same algebra as [[graft.ops.RangeJoin]], applied
  * by the planner to joins the USER wrote naively — the
  * `SparkSessionExtensions` counterpart of a range-join hint.
  *
  * Integer truncating division (`div`) is used for banding: it is
  * monotone non-decreasing, so `lo <= p <= hi` implies `p`'s band lies
  * in the exploded `[band(lo), band(hi)]` range — consistent banding
  * is all correctness needs; exact floor semantics are not required.
  *
  * Off by default. Enable with `spark.graft.rangeJoin.bandWidth=<w>`
  * (a width near the typical interval length keeps both the explosion
  * factor and band-local pair counts linear). Scope guards: inner
  * join, both bound expressions from the same side, integral types,
  * deterministic expressions, and NO existing cross-side equality
  * (an equi key means the planner already hash-joins; re-matching its
  * own output is prevented by the band equality it introduces).
  */
case class BandedRangeJoin(spark: SparkSession) extends Rule[LogicalPlan] {

  private val Band = "__graft_band"

  private def width: Long =
    try spark.conf.get("spark.graft.rangeJoin.bandWidth", "0").toLong
    catch { case _: NumberFormatException => 0L }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        rewrite(j, left, right, cond, hint, w).getOrElse(j)
    }
  }

  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(l.outputSet)) Some(true)
    else if (refs.subsetOf(r.outputSet)) Some(false)
    else None
  }

  private def rewrite(
      j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(cond)
    if (conjuncts.exists(!_.deterministic)) return None

    // any cross-side equality → the planner already has its key
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (for (sa <- sideOf(a, left, right); sb <- sideOf(b, left, right))
          yield sa != sb).getOrElse(false)
      case _ => false
    }
    if (hasEqui) return None

    // normalise cross-side bounds to (point, bound, pointIsLowerBounded):
    // each comparison yields BOTH readings (either operand could be the
    // point); the pair search below resolves which one range-bounds a
    // single point expression from both directions.
    def bounds(c: Expression): Seq[(Expression, Expression, Boolean)] = {
      def cross(a: Expression, b: Expression) = (for {
        sa <- sideOf(a, left, right); sb <- sideOf(b, left, right)
        if sa != sb && integral(a) && integral(b)
      } yield ()).isDefined
      c match {
        case GreaterThanOrEqual(a, b) if cross(a, b) =>
          Seq((a, b, true), (b, a, false)) // a >= b: p=a lower / p=b upper
        case LessThanOrEqual(a, b) if cross(a, b) =>
          Seq((a, b, false), (b, a, true)) // a <= b: p=a upper / p=b lower
        case _ => Seq.empty
      }
    }
    val bs = conjuncts.flatMap(c => bounds(c).map(c -> _))
    // one `p >= lo` and one `p <= hi` over the SAME point expression,
    // bounds living on the point's opposite side
    val pair = (for {
      (_, (p1, lo, true)) <- bs
      (_, (p2, hi, false)) <- bs
      if p1.semanticEquals(p2)
      pSide <- sideOf(p1, left, right)
      loSide <- sideOf(lo, left, right)
      hiSide <- sideOf(hi, left, right)
      if loSide != pSide && hiSide != pSide
    } yield (p1, lo, hi, pSide)).headOption
    pair.map { case (p, lo, hi, pointOnLeft) =>
      val wl = Literal(w, LongType)
      val bandAttrP = AttributeReference(Band + "_p", LongType, nullable = true)()
      val bandAttrI = AttributeReference(Band + "_i", LongType, nullable = true)()

      val (pSide, iSide) = if (pointOnLeft) (left, right) else (right, left)
      val pBanded = Project(
        pSide.output :+ Alias(IntegralDivide(asLong(p), wl), Band + "_p")(
          exprId = bandAttrP.exprId),
        pSide)
      // TimeZoneAwareExpression: without an explicit zone the node stays
      // unresolved and the optimizer rejects the rewrite outright.
      // The stop is clamped to at least the start: a build row with
      // lo > hi (empty interval) would otherwise make Sequence throw
      // "Illegal sequence boundaries" at runtime, where the
      // un-rewritten nested-loop join just produced no match. The one
      // spurious band the clamp emits is removed by `cond`, which the
      // banded join re-checks in full.
      val bandLo = IntegralDivide(asLong(lo), wl)
      val bandHi = IntegralDivide(asLong(hi), wl)
      val seq = Sequence(
        bandLo,
        Greatest(Seq(bandLo, bandHi)),
        Some(Literal(1L, LongType)),
        Some(spark.sessionState.conf.sessionLocalTimeZone))
      val iBanded = Generate(
        Explode(seq),
        unrequiredChildIndex = Nil,
        outer = false,
        qualifier = None,
        generatorOutput = Seq(bandAttrI),
        child = iSide)

      val (newLeft, newRight) =
        if (pointOnLeft) (pBanded, iBanded) else (iBanded, pBanded)
      val banded = Join(
        newLeft, newRight, Inner,
        Some(And(EqualTo(bandAttrP, bandAttrI), cond)), hint)
      Project(j.output, banded)
    }
  }
}
