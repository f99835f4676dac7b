package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, And, Cast, EqualTo, Expression, Greatest, GreaterThan, GreaterThanOrEqual, Least, LessThan, LessThanOrEqual, Literal, Multiply, Or, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.expressions.{SequenceRatio, Utf16Length}

/** Optimizer rule: prepend difflib's `real_quick_ratio` length bound to any
  * filter that thresholds a [[SequenceRatio]].
  *
  * `SequenceRatio` is O(|a|·|b|) per row (the quadratic longest-matching-
  * block recursion), but its value is bounded above by a pure length
  * computation: ratio = 2M/(|a|+|b|) with M ≤ min(|a|,|b|), so
  *
  *   seq_ratio(a, b) >= t   ⟹   2·min(|a|,|b|) >= t·(|a|+|b|)
  *
  * — `difflib.SequenceMatcher.real_quick_ratio`, the check difflib users
  * apply by hand before paying for `ratio()`. This rule applies it
  * automatically: for every conjunct of the form `seq_ratio(a,b) >= t`
  * (or `>`, or the flipped `t <= seq_ratio(a,b)`, or equality) with a
  * positive double literal threshold, it prepends the implied length
  * predicate to the SAME filter. `And` short-circuits left-to-right in
  * generated code, so rows failing the O(1) bound never run the quadratic
  * ratio — on a fuzzy threshold join this skips the expensive expression
  * for every badly-length-mismatched pair, which at high thresholds is
  * most of them.
  *
  * Exactness: lengths are [[Utf16Length]] (UTF-16 units — the measure the
  * engine's `SequenceRatio` actually computes over, NOT Spark's
  * code-point `length()`; the two differ on supplementary-plane
  * characters, where a code-point bound would be unsound in both
  * directions). Null semantics are preserved: the bound is null exactly
  * when a or b is null, where the original conjunct is also null, and
  * `null AND x` can never turn a kept row into a dropped one (or vice
  * versa) inside a Filter. Strictness is matched (`>` gets a strict
  * bound), so boundary rows are never lost.
  *
  * The rule is idempotent (a bound already present — by semantic equality
  * — is not re-added), registered via [[graft.GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`) or per-session through
  * `spark.experimental.extraOptimizations`.
  */
object SequenceRatioLengthBound extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      withBounds(cond).map(Filter(_, child)).getOrElse(f)
    // The engine's fuzzy resolution is a thresholded CROSS join
    // (`ops/DeviceResolution.scala`): by the time this rule runs,
    // PushPredicateThroughJoin has absorbed the ratio filter into the join
    // CONDITION, so there is no Filter node left to match. Strengthening a
    // join condition with an implied conjunct is sound for every join type:
    // where the original condition is true the bound is implied true, and
    // where it is false or null the conjunction stays non-true (false and
    // null are equivalent as join-match verdicts).
    case j @ Join(l, r, jt, Some(cond), hint) =>
      withBounds(cond).map(c => Join(l, r, jt, Some(c), hint)).getOrElse(j)
  }

  /** `cond` with the implied length bounds prepended, or None if there is
    * nothing to add (no thresholded ratio, or the bounds already present).
    */
  private def withBounds(cond: Expression): Option[Expression] = {
    val conj = splitConjunctivePredicates(cond)
    val extra = dedupSemantic(conj.flatMap(boundFor))
      .filterNot(b => conj.exists(_.semanticEquals(b)))
    if (extra.isEmpty) None else Some((extra ++ conj).reduce(And))
  }

  /** The length bound implied by one conjunct, when it is a positive
    * double-literal threshold on a SequenceRatio — or on a `greatest(...)`
    * whose children are ALL SequenceRatios (the shape the engine's fuzzy
    * device resolution filters on: the max of the two street orderings,
    * `ops/DeviceResolution.scala`). For greatest the implied predicate is
    * the OR of the per-pair bounds: `greatest(r1..rn) >= t` means SOME
    * non-null `ri >= t`, which implies that pair's bound, which implies the
    * disjunction. Spark's `greatest` SKIPS null children (null only when
    * all are null), and a null pair's bound is null — `null OR true` is
    * still true, so a kept row can never fail the disjunction.
    */
  private def boundFor(p: Expression): Option[Expression] = if (!p.deterministic) {
    // the bound re-evaluates sr.left/sr.right inside new Utf16Length
    // expressions — sound only when they produce the same value both times.
    // A non-deterministic input (rand()-derived etc.) would see DIFFERENT
    // values in the bound vs the ratio and could drop rows the original
    // predicate keeps; skip, matching Catalyst's usual rule discipline.
    None
  } else p match {
    case GreaterThanOrEqual(Ratios(rs), Literal(t: Double, DoubleType)) if t > 0 =>
      Some(boundAny(rs, t, strict = false))
    case GreaterThan(Ratios(rs), Literal(t: Double, DoubleType)) if t > 0 =>
      Some(boundAny(rs, t, strict = true))
    case LessThanOrEqual(Literal(t: Double, DoubleType), Ratios(rs)) if t > 0 =>
      Some(boundAny(rs, t, strict = false))
    case LessThan(Literal(t: Double, DoubleType), Ratios(rs)) if t > 0 =>
      Some(boundAny(rs, t, strict = true))
    case EqualTo(Ratios(rs), Literal(t: Double, DoubleType)) if t > 0 =>
      Some(boundAny(rs, t, strict = false))
    case EqualTo(Literal(t: Double, DoubleType), Ratios(rs)) if t > 0 =>
      Some(boundAny(rs, t, strict = false))
    case _ => None
  }

  /** A bare SequenceRatio, or a Greatest over only SequenceRatios. */
  private object Ratios {
    def unapply(e: Expression): Option[Seq[SequenceRatio]] = e match {
      case sr: SequenceRatio => Some(Seq(sr))
      case Greatest(children) if children.nonEmpty &&
          children.forall(_.isInstanceOf[SequenceRatio]) =>
        Some(children.map(_.asInstanceOf[SequenceRatio]))
      case _ => None
    }
  }

  private def boundAny(rs: Seq[SequenceRatio], t: Double, strict: Boolean): Expression =
    rs.map(bound(_, t, strict)).reduce(Or)

  /** `2·min(u16(a), u16(b)) {>,>=} t·(u16(a)+u16(b)) OR u16(a)+u16(b) = 0`,
    * all in DOUBLE. The both-empty escape matches difflib's special case
    * `ratio("", "") = 1.0` (the 2M/(|a|+|b|) formula is 0/0 there): without
    * it, a STRICT bound would evaluate `0 > 0` = false and drop a pair the
    * ratio keeps. The escape is null exactly when a or b is null (Add of a
    * null length), so `null OR null` preserves the documented null
    * semantics.
    */
  private def bound(sr: SequenceRatio, t: Double, strict: Boolean): Expression = {
    val ua = Utf16Length(sr.left)
    val ub = Utf16Length(sr.right)
    val sum = Add(ua, ub)
    val lhs = Multiply(Literal(2.0), Cast(Least(Seq(ua, ub)), DoubleType))
    val rhs = Multiply(Literal(t), Cast(sum, DoubleType))
    val cmp = if (strict) GreaterThan(lhs, rhs) else GreaterThanOrEqual(lhs, rhs)
    Or(cmp, EqualTo(sum, Literal(0)))
  }

  private def dedupSemantic(es: Seq[Expression]): Seq[Expression] =
    es.foldLeft(Vector.empty[Expression]) { (acc, e) =>
      if (acc.exists(_.semanticEquals(e))) acc else acc :+ e
    }
}
