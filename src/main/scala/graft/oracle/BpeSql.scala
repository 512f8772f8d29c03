package graft.oracle

/** DuckDB replica of [[graft.ops.Bpe]]'s merge rounds, relationally:
  * symbol arrays become (w, pos, sym) rows, and the left-greedy merge
  * becomes the gaps-and-islands even-offset rule — a match position
  * is applied iff its offset from the start of its maximal run of
  * consecutive match positions is even (runs longer than 1 only occur
  * for a = b rules; see the equivalence argument in ops.Bpe's
  * scaladoc). Each round is one mechanical CTE block, chained k
  * times; the argmax rule is re-derived INSIDE the SQL per round
  * (same total order: count DESC, pair lexicographic), so the oracle
  * is fully independent of the Spark side.
  *
  * Determinism note (the round-9 `dedup_substring_remove` lesson):
  * every window here orders by a TOTAL key within its partition
  * ((w, pos) rows are unique by construction), so no chained-window
  * tie instability is possible.
  */
object BpeSql {

  /** One merge round: consumes CTE `s$r` (w, pos, sym), emits
    * `s${r+1}`. Expects `wc` (w, cnt) in scope. `minCount > 1`
    * replicates the threshold-stopped training variant: an empty
    * best$r makes the round (and hence every later round) a no-op.
    */
  private def round(r: Int, minCount: Long): String = {
    val in = s"s$r"
    s"""bp$r AS MATERIALIZED (
       |  SELECT a.sym AS pa, b.sym AS pb, SUM(wc.cnt) AS pc
       |  FROM $in a
       |  JOIN $in b ON b.w = a.w AND b.pos = a.pos + 1
       |  JOIN wc ON wc.w = a.w
       |  GROUP BY a.sym, b.sym),
       |best$r AS MATERIALIZED (
       |  SELECT pa, pb FROM bp$r WHERE pc >= $minCount
       |  ORDER BY pc DESC, pa, pb LIMIT 1),
       |m$r AS MATERIALIZED (
       |  SELECT a.w, a.pos
       |  FROM $in a
       |  JOIN $in b ON b.w = a.w AND b.pos = a.pos + 1
       |  JOIN best$r ON a.sym = best$r.pa AND b.sym = best$r.pb),
       |k$r AS MATERIALIZED (
       |  SELECT w, pos FROM (
       |    SELECT w, pos, pos - min(pos) OVER (PARTITION BY w, grp) AS off
       |    FROM (SELECT w, pos,
       |            pos - row_number() OVER (PARTITION BY w ORDER BY pos) AS grp
       |          FROM m$r))
       |  WHERE off % 2 = 0),
       |s${r + 1} AS MATERIALIZED (
       |  SELECT s.w,
       |         CAST(row_number() OVER (PARTITION BY s.w ORDER BY s.pos) AS BIGINT) - 1 AS pos,
       |         CASE WHEN k.pos IS NOT NULL THEN s.sym || nx.sym ELSE s.sym END AS sym
       |  FROM $in s
       |  LEFT JOIN k$r k ON k.w = s.w AND k.pos = s.pos
       |  LEFT JOIN $in nx ON nx.w = s.w AND nx.pos = s.pos + 1
       |  LEFT JOIN k$r pk ON pk.w = s.w AND pk.pos = s.pos - 1
       |  WHERE pk.pos IS NULL)""".stripMargin
  }

  /** The k chained round blocks, to splice after `s0`/`wc` CTEs. */
  def chain(k: Int, minCount: Long = 1L): String =
    (0 until k).map(round(_, minCount)).mkString(",\n")

  /** Name of the final symbol relation after k rounds. */
  def finalTable(k: Int): String = s"s$k"

  /** One APPLICATION round over a separate corpus: consumes CTE `t$r`
    * (w, pos, sym), emits `t${r+1}`, using the TRAINING chain's
    * `best$r` already in scope — the rule is applied, never
    * re-derived, which is exactly the train-here/serve-there split.
    * Same gaps-and-islands even-offset semantics as [[round]].
    */
  private def applyRound(r: Int): String = {
    val in = s"t$r"
    s"""am$r AS MATERIALIZED (
       |  SELECT a.w, a.pos
       |  FROM $in a
       |  JOIN $in b ON b.w = a.w AND b.pos = a.pos + 1
       |  JOIN best$r ON a.sym = best$r.pa AND b.sym = best$r.pb),
       |ak$r AS MATERIALIZED (
       |  SELECT w, pos FROM (
       |    SELECT w, pos, pos - min(pos) OVER (PARTITION BY w, grp) AS off
       |    FROM (SELECT w, pos,
       |            pos - row_number() OVER (PARTITION BY w ORDER BY pos) AS grp
       |          FROM am$r))
       |  WHERE off % 2 = 0),
       |t${r + 1} AS MATERIALIZED (
       |  SELECT s.w,
       |         CAST(row_number() OVER (PARTITION BY s.w ORDER BY s.pos) AS BIGINT) - 1 AS pos,
       |         CASE WHEN k.pos IS NOT NULL THEN s.sym || nx.sym ELSE s.sym END AS sym
       |  FROM $in s
       |  LEFT JOIN ak$r k ON k.w = s.w AND k.pos = s.pos
       |  LEFT JOIN $in nx ON nx.w = s.w AND nx.pos = s.pos + 1
       |  LEFT JOIN ak$r pk ON pk.w = s.w AND pk.pos = s.pos - 1
       |  WHERE pk.pos IS NULL)""".stripMargin
  }

  /** k application blocks (t0 → tk), to splice AFTER the training
    * [[chain]] so each `best$r` is in scope.
    */
  def applyChain(k: Int): String =
    (0 until k).map(applyRound).mkString(",\n")

  /** Name of the final applied symbol relation after k rounds. */
  def applyFinalTable(k: Int): String = s"t$k"
}
