package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/**
 * Optimizer rule: bound thresholded Levenshtein filters.
 *
 * A filter of the form `levenshtein(a, b) <= k` computes the FULL
 * O(|a|·|b|) dynamic program for every pair and then throws most
 * results away. When the caller only needs "within k" (every
 * record-linkage verify — [[graft.dedup.Dedup.blockedEditDistance]]'s
 * shape), two strictly cheaper equivalents exist:
 *
 *  1. the LENGTH BOUND: |len(a) − len(b)| > k ⇒ distance > k, an
 *     O(1) reject that short-circuits the conjunction (codegen
 *     evaluates And left-to-right), and
 *  2. Spark's own BANDED form `levenshtein(a, b, k)` (threshold
 *     argument), which runs the Ukkonen O(k·min) band and returns −1
 *     the moment the distance provably exceeds k — so
 *     `levenshtein(a, b) <= k  ⟺  levenshtein(a, b, k) >= 0`.
 *
 * The rewrite fires on `lev <= k` and the mirrored `k >= lev`, with
 * or without an integral up-cast around the Levenshtein call (the
 * `.cast("long")` the graft operators apply), for non-negative
 * integral literals k. It is value-preserving under SQL null
 * semantics: any null input nulls both forms, and a null conjunct
 * keeps the whole condition null (filtered) exactly as before.
 * Idempotent by construction — the rewritten call carries
 * `threshold = Some(...)`, which the matcher refuses.
 *
 * This is the repo's `Rule[LogicalPlan]` rung of the extension
 * ladder (SURVEY §7.3): expressions where possible, a logical
 * REWRITE where the win is plan-level, never a custom physical
 * operator where the builtin executor already has the fast path.
 * Installed by [[graft.functions.GraftFunctions.register]] (session
 * `experimental.extraOptimizations` — runs after operator
 * optimization, so filter pushdown has already inlined the
 * expression into the conditions this matches) and by the
 * `GraftExtensions` config entry point.
 */
object LevenshteinLengthBound extends Rule[LogicalPlan] {

  /** Literal non-negative int-ish threshold (bounded — a threshold
    * wider than any real string is not worth banding). */
  private def kOf(e: Expression): Option[Int] = e match {
    case Literal(i: Int, IntegerType) if i >= 0 && i <= (1 << 20) => Some(i)
    case Literal(l: Long, LongType) if l >= 0L && l <= (1L << 20) => Some(l.toInt)
    case _ => None
  }

  /** An un-thresholded Levenshtein, possibly under an integral
    * up-cast; returns the call plus the wrapper to re-apply. */
  private def unwrap(e: Expression): Option[(Levenshtein, Expression => Expression)] =
    e match {
      case lev: Levenshtein if lev.threshold.isEmpty =>
        Some((lev, identity))
      case c: Cast if (c.dataType == LongType || c.dataType == IntegerType) =>
        c.child match {
          case lev: Levenshtein if lev.threshold.isEmpty =>
            Some((lev, x => c.withNewChildren(Seq(x))))
          case _ => None
        }
      case _ => None
    }

  private def bounded(
      lev: Levenshtein, wrap: Expression => Expression, k: Int,
      zeroLike: Expression): Expression = {
    val lenGuard = LessThanOrEqual(
      Abs(Subtract(Length(lev.left), Length(lev.right))), Literal(k))
    val banded = lev.copy(threshold = Some(Literal(k)))
    val zero = zeroLike match {
      case Literal(_: Long, LongType) => Literal(0L)
      case _ => Literal(0)
    }
    And(lenGuard, GreaterThanOrEqual(wrap(banded), zero))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(l, r) if unwrap(l).isDefined && kOf(r).isDefined =>
        val (lev, wrap) = unwrap(l).get
        bounded(lev, wrap, kOf(r).get, r)
      case GreaterThanOrEqual(l, r) if kOf(l).isDefined && unwrap(r).isDefined =>
        val (lev, wrap) = unwrap(r).get
        bounded(lev, wrap, kOf(l).get, l)
    }
}
