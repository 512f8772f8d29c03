package graft.oracle

import graft.functions.NumericExpressions.exp2Consts

/** DuckDB replica of [[graft.functions.NumericExpressions.Exp2Fixed]]
  * — the inverse axis of the float frontier. Generates a CTE chain
  * computing the IDENTICAL `floor(2^x · 2²⁰)` longs with plain SQL
  * integer arithmetic: same constants (embedded from [[exp2Consts]] —
  * one source of truth), same exact 21-bit-limb multiply
  *   m·C div 2⁴⁰ = 4·hₘ·h_c + (hₘ·l_c + lₘ·h_c + (lₘ·l_c div 2²¹)) div 2¹⁹,
  * same final shift assembly. A hash-equal CORRECTNESS row certifies
  * the Spark expression bit for bit.
  *
  * Like [[Log2Sql]], the chain runs once per DISTINCT input — callers
  * dedupe upstream and join the result back. Inputs must satisfy
  * 0 ≤ v < 43·2²⁰ (the expression's non-null domain).
  */
object Exp2Sql {

  /** CTE definitions (to splice into a WITH list) computing, for
    * every row of `srcSelect` — one BIGINT column `v`, deduplicated,
    * in-domain — the relation `<p>(v, e2)` with
    * `e2 = exp2_fixed(v)`. Emits CTEs `<p>0 … <p>20` and `<p>`.
    */
  def chain(p: String, srcSelect: String): String = {
    val init =
      s"""${p}0 AS (
         |  SELECT v, v // 1048576 AS e, v % 1048576 AS f,
         |         CAST(1099511627776 AS BIGINT) AS m
         |  FROM ($srcSelect))""".stripMargin
    val steps = (1 to 20).map { k =>
      val c = exp2Consts(k - 1)
      val hc = c >> 21
      val lc = c & 0x1FFFFFL
      s"""${p}$k AS (
         |  SELECT v, e, f,
         |         (CASE WHEN (f // ${1L << (20 - k)}) % 2 = 1
         |               THEN 4 * (m // 2097152) * $hc
         |                    + ((m // 2097152) * $lc + (m % 2097152) * $hc
         |                       + (((m % 2097152) * $lc) // 2097152)) // 524288
         |               ELSE m END) AS m
         |  FROM ${p}${k - 1})""".stripMargin
    }
    // GREATEST clamps keep both shift amounts non-negative even when a
    // vectorized engine evaluates the unselected CASE branch.
    val fin =
      s"""$p AS (
         |  SELECT v, (CASE WHEN e >= 20
         |                  THEN m * (CAST(1 AS BIGINT) << CAST(GREATEST(e - 20, 0) AS INT))
         |                  ELSE m // (CAST(1 AS BIGINT) << CAST(GREATEST(20 - e, 0) AS INT)) END) AS e2
         |  FROM ${p}20)""".stripMargin
    (init +: steps :+ fin).mkString(",\n")
  }
}
