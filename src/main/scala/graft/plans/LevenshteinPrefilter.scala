package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression,
  GreaterThanOrEqual, Length, LessThanOrEqual, Levenshtein, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite `levenshtein(a, b) <= k` filter predicates
  * into their banded, guarded form.
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
  * Only Filter predicates are rewritten; a projected distance column
  * still computes the full value for rows that survive.
  *
  * Idempotence (user rules run in a fixed-point batch): the rewritten
  * predicate contains no bare `lev <= k` comparison — the threshold
  * form compares `>= 0` — so the rule is structurally a no-op on its
  * own output.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def addGuard(e: Expression): Expression = e match {
    case LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(kv: Int, IntegerType))
        if kv >= 0 =>
      And(
        LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k),
        GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0, IntegerType)))
    case And(l, r) => And(addGuard(l), addGuard(r))
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val rewritten = addGuard(cond)
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
  }
}
