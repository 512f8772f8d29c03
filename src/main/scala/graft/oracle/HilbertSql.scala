package graft.oracle

/** DuckDB replica of
  * [[graft.functions.NumericExpressions.hilbert16J]]: the 16
  * rotate/reflect rounds unrolled as chained CTEs, each round pure
  * nonnegative integer arithmetic (`%`, `//`, `*`, `+`, CASE) — the
  * explicit low-bit masking in the kernel is what makes `%` suffice
  * (no reliance on two's-complement `&` semantics). A hash-equal
  * CORRECTNESS row certifies the Spark codegen loop bit for bit.
  */
object HilbertSql {

  /** One round k: consumes `<p>{k+1}` carrying (carry..., x, y, d),
    * emits `<p>{k}`. `carryCols` is the comma-joined passthrough
    * column list.
    */
  private def round(p: String, k: Int, carryCols: String): String = {
    val s = 1L << k
    val sq = s * s
    val mask = s - 1L
    s"""${p}$k AS (
       |  SELECT $carryCols,
       |         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN $mask - (y % $s) ELSE y % $s END)
       |              ELSE x % $s END AS x,
       |         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN $mask - (x % $s) ELSE x % $s END)
       |              ELSE y % $s END AS y,
       |         d + $sq * xor(3 * rx, ry) AS d
       |  FROM (SELECT *, (x // $s) % 2 AS rx, (y // $s) % 2 AS ry FROM ${p}${k + 1}))""".stripMargin
  }

  /** The 16 chained round CTEs. `src` must yield the carry columns
    * plus `x`, `y` (0 ≤ · < 2¹⁶) and is named `<p>16`; the final
    * relation `<p>0` carries (carry..., x, y, d) with `d` the
    * Hilbert index.
    */
  def chain(p: String, src: String, carryCols: String): String = {
    val head = s"${p}16 AS ($src)"
    val steps = (15 to 0 by -1).map(round(p, _, carryCols))
    (head +: steps).mkString(",\n")
  }
}
