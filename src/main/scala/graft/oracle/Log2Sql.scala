package graft.oracle

/** DuckDB replica of [[graft.functions.NumericExpressions.Log2Fixed]]:
  * generates a CTE chain that computes the IDENTICAL fixed-point
  * `log2 · 2²⁰` integers with plain SQL integer arithmetic — the
  * oracle side of the "oracle-able float frontier" (SURVEY §8.r9.5).
  *
  * Every operation is exact 64-bit integer math with a single
  * representable result (`//`, `%`, `*`, `+`, comparisons), so a
  * hash-equal CORRECTNESS row certifies the Spark expression bit for
  * bit. The 21-bit limb split mirrors the Scala kernel literally:
  *   m² div 2⁴⁰ = 4h² + (2hl + (l² div 2²¹)) div 2¹⁹,
  * h = m div 2²¹, l = m mod 2²¹ — exact, intermediates < 2⁴³.
  *
  * The msb position is a sum of 62 range comparisons rather than a
  * builtin (`bin`/`bit_length` portability varies across DuckDB
  * versions); it runs once per DISTINCT input value — callers dedupe
  * upstream and join the result back.
  */
object Log2Sql {

  /** CTE definitions (to splice into a WITH list) computing, for
    * every row of `srcSelect` — a subquery yielding one positive
    * BIGINT column `v`, pre-deduplicated by the caller — the final
    * relation `<p>(v, l20)` with `l20 = log2_fixed(v)`.
    * Emits CTEs `<p>0 … <p>20` and `<p>`.
    */
  def chain(p: String, srcSelect: String): String = {
    val eSum = (1 to 62)
      .map(j => s"(CASE WHEN v >= ${BigInt(2).pow(j)} THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val init =
      s"""${p}0 AS (
         |  SELECT v, e, 0 AS frac,
         |         (CASE WHEN e <= 40 THEN v << (40 - e) ELSE v >> (e - 40) END) AS m
         |  FROM (SELECT v, $eSum AS e FROM ($srcSelect)))""".stripMargin
    val steps = (1 to 20).map { k =>
      s"""${p}$k AS (
         |  SELECT v, e,
         |         frac * 2 + (CASE WHEN m2 >= 2199023255552 THEN 1 ELSE 0 END) AS frac,
         |         (CASE WHEN m2 >= 2199023255552 THEN m2 // 2 ELSE m2 END) AS m
         |  FROM (SELECT v, e, frac,
         |               4 * (m // 2097152) * (m // 2097152)
         |                 + ((2 * (m // 2097152) * (m % 2097152)
         |                     + (((m % 2097152) * (m % 2097152)) // 2097152)) // 524288) AS m2
         |        FROM ${p}${k - 1}))""".stripMargin
    }
    val fin = s"$p AS (SELECT v, e * 1048576 + frac AS l20 FROM ${p}20)"
    (init +: steps :+ fin).mkString(",\n")
  }
}
