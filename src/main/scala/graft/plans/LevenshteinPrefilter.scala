package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression,
  GreaterThan, GreaterThanOrEqual, Length, LessThan, LessThanOrEqual,
  Levenshtein, Literal, Not, Or, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite `levenshtein(a, b) <= k` threshold
  * predicates into their banded, guarded form.
  *
  * Two public facts about edit distance make the rewrite exact:
  *
  *  1. `lev(a, b) >= |length(a) - length(b)|` (each edit changes the
  *     length by at most one), so a length-difference guard is implied
  *     by the predicate and, evaluated first under short-circuit AND,
  *     costs O(1) where the distance costs O(len²).
  *  2. Spark's three-argument `levenshtein(a, b, k)` runs the BANDED
  *     dynamic program — O(k·len) instead of O(len²) — and returns -1
  *     iff the true distance exceeds k. Hence
  *     `lev(a, b) <= k  ⟺  levenshtein(a, b, k) >= 0`.
  *
  * Together: `lev(a,b) <= k` becomes
  * `abs(length(a) - length(b)) <= k AND levenshtein(a, b, k) >= 0`.
  *
  * The rewrite is a full boolean EQUIVALENCE (NULL-preserving too:
  * both sides are NULL iff an input is NULL), so it substitutes
  * safely under And / Or / Not, in either comparison orientation
  * (`k >= lev(a,b)` included), for strict forms (`lev < k ⟺
  * lev <= k-1`), and in Join conditions as well as Filters — a
  * blocked fuzzy self-join's verify predicate is pushed INTO the
  * join by Catalyst, where the Filter-only r2 rule never saw it.
  * Only predicates are rewritten; a projected distance column still
  * computes the full value for rows that survive.
  *
  * Idempotence (user rules run in a fixed-point batch): the rewritten
  * predicate's Levenshtein carries `Some(k)` where the patterns here
  * demand `None`, so the rule is structurally a no-op on its output.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  /** `lev(a,b) <= k` in banded, guarded form. */
  private def banded(a: Expression, b: Expression, k: Literal): Expression =
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k),
      GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0, IntegerType)))

  private def addGuard(e: Expression): Expression = e match {
    case LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(kv: Int, IntegerType))
        if kv >= 0 =>
      banded(a, b, k)
    case GreaterThanOrEqual(k @ Literal(kv: Int, IntegerType), Levenshtein(a, b, None))
        if kv >= 0 =>
      banded(a, b, k)
    case LessThan(Levenshtein(a, b, None), Literal(kv: Int, IntegerType))
        if kv >= 1 =>
      banded(a, b, Literal(kv - 1, IntegerType))
    case GreaterThan(Literal(kv: Int, IntegerType), Levenshtein(a, b, None))
        if kv >= 1 =>
      banded(a, b, Literal(kv - 1, IntegerType))
    case And(l, r) => And(addGuard(l), addGuard(r))
    case Or(l, r) => Or(addGuard(l), addGuard(r))
    case Not(c) => Not(addGuard(c))
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, _) =>
      val rewritten = addGuard(cond)
      if (rewritten fastEquals cond) f else f.copy(condition = rewritten)
    case j @ Join(_, _, _, Some(cond), _) =>
      val rewritten = addGuard(cond)
      if (rewritten fastEquals cond) j else j.copy(condition = Some(rewritten))
  }
}
