package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.JaroWinklerSim

/**
 * Optimizer rule: length-bound thresholded Jaro–Winkler filters — the
 * third rung of the repo's rewrite ladder
 * ([[LevenshteinLengthBound]], [[RangeRankRewrite]] are the first
 * two), carried as a candidate since round 12.
 *
 * A filter `graft_jaro_winkler(a, b) >= t` runs the O(|a|·|b|)
 * match-window scan for every pair and throws most results away.
 * For t > 0.8 a cheap necessary condition exists. With
 * r = min(|a|,|b|) / max(|a|,|b|):
 *
 *  - jaro = (m/la + m/lb + (m−t)/m)/3 with m ≤ min(la, lb), so
 *    jaro ≤ (1 + r + 1)/3 = (2 + r)/3;
 *  - the Winkler boost adds at most 0.4·(1 − jaro) (prefix ≤ 4,
 *    p = 0.1), so jw ≤ 0.4 + 0.6·jaro, i.e. jw ≥ t ⟹
 *    jaro ≥ (t − 0.4)/0.6 (also valid on the no-boost branch since
 *    t ≤ 1 ⟹ t ≥ (t − 0.4)/0.6);
 *  - chaining: jw ≥ t ⟹ (2 + r)/3 ≥ (t − 0.4)/0.6 ⟹ r ≥ 5t − 4.
 *
 * The rewrite prepends `min·1.0 ≥ (5t − 4 − ε)·max` as a conjunction
 * (codegen evaluates And left-to-right, so a length-mismatched pair
 * never reaches the quadratic kernel). ε = 1e-9 absorbs the kernel's
 * floating-point drift from the real-arithmetic derivation (~1e-15) —
 * the guard must never reject a pair the exact comparison keeps; the
 * property spec hammers that direction on random pairs. Fires on
 * `jw >= t`, `jw > t` (the ≥ bound is necessary a fortiori) and both
 * mirrored literal-first forms, for double literals t ∈ (0.8, 1.0]
 * (at t ≤ 0.8 the bound is vacuous). Value-preserving under SQL null
 * semantics: any null input nulls both the guard and the original
 * compare, and non-null inputs make the guard false only when the
 * theorem already makes the compare false. Idempotent via the
 * `bounded` marker on the rewritten call.
 *
 * Shipped win: jw1's `minSim = 0.94` block self-join gets a 0.7
 * length-ratio pre-filter on every candidate pair, values unchanged
 * (the key's oracle hash is the proof).
 */
object JaroWinklerLengthBound extends Rule[LogicalPlan] {

  private val Eps = 1e-9

  private def tOf(e: Expression): Option[Double] = e match {
    case Literal(d: Double, DoubleType) if d > 0.8 && d <= 1.0 => Some(d)
    case _ => None
  }

  private def unwrap(e: Expression): Option[JaroWinklerSim] = e match {
    case jw: JaroWinklerSim if !jw.bounded => Some(jw)
    case _ => None
  }

  private def guarded(
      jw: JaroWinklerSim, t: Double,
      rebuild: Expression => Expression): Expression = {
    val bound = Literal(5.0 * t - 4.0 - Eps)
    // BYTE length (OctetLength), not character Length: the kernel
    // scores UTF8String BYTES, and the guard must be necessary for
    // the kernel's ratio — char/byte ratios diverge on multi-byte text
    def len(x: Expression) = Cast(OctetLength(x), DoubleType)
    val la = len(jw.left); val lb = len(jw.right)
    val guard = And(
      GreaterThanOrEqual(la, Multiply(bound, len(jw.right))),
      GreaterThanOrEqual(lb, Multiply(bound, len(jw.left))))
    And(guard, rebuild(jw.copy(bounded = true)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThanOrEqual(l, r) if unwrap(l).isDefined && tOf(r).isDefined =>
        guarded(unwrap(l).get, tOf(r).get, x => GreaterThanOrEqual(x, r))
      case GreaterThan(l, r) if unwrap(l).isDefined && tOf(r).isDefined =>
        guarded(unwrap(l).get, tOf(r).get, x => GreaterThan(x, r))
      case LessThanOrEqual(l, r) if tOf(l).isDefined && unwrap(r).isDefined =>
        guarded(unwrap(r).get, tOf(l).get, x => LessThanOrEqual(l, x))
      case LessThan(l, r) if tOf(l).isDefined && unwrap(r).isDefined =>
        guarded(unwrap(r).get, tOf(l).get, x => LessThan(l, x))
    }
}
