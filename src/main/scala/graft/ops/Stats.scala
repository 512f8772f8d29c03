package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Determinism.Money
import graft.io.Readers.table

/** Catalog statistics (round 6): the ANALYZE-style per-column profile
  * a planner feeds on — row count, null count, distinct count, min and
  * max per column, one output row per column.
  *
  * Why it's first-class at 100 TB: broadcast decisions, bucket counts,
  * skew salting factors and file-compaction targets all start from
  * exactly these numbers (the repo's own `joinBloomSemi` doc comment
  * defers its sizing count "to table stats" — this is that table).
  *
  * Scale shape: ONE pass over the table; every statistic is an
  * algebraic aggregate with map-side partials except the exact
  * distinct counts, which Catalyst plans as a single Expand (one row
  * per column per input row) feeding one hash aggregate — linear, no
  * joins, no per-column re-scans. At warehouse scale you'd swap the
  * exact NDVs for `approx_count_distinct` (the HLL variant is
  * demonstrated by `agg_approx_distinct`); the oracle'd key keeps them
  * exact so the result is hash-checkable.
  */
object Stats {

  import Relational.Q

  /** Per-column (non-null count, exact NDV, min, max) in TWO
    * aggregation passes whose single-row results cross-join: one for
    * the algebraic aggregates (count/min/max), one for the exact
    * NDVs. Mixing them in a single `agg` is a measured trap — Catalyst
    * plans N distincts + algebraic aggs together as one Expand whose
    * generated aggregate is big enough to fall out of efficient
    * codegen: 5.9 s warm / 17 s cold at sf0.1, vs 0.3 s for EACH half
    * run separately (ScratchStats A/B, 2026-08-12). Two cheap scans
    * beat one pathological one; the cross join is 1×1 rows.
    *
    * Min/max aggregate on the NATIVE type (string-casting first would
    * order "9" > "10") and render to string only in the final
    * projection.
    */
  def columnStats(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    val algebraic = cols.flatMap { case (n, c) =>
      Seq(count(c).as(s"cnt_$n"), min(c).as(s"min_$n"), max(c).as(s"max_$n"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), algebraic: _*)
    val ndvs = df.agg(
      countDistinct(cols.head._2).as(s"ndv_${cols.head._1}"),
      cols.tail.map { case (n, c) => countDistinct(c).as(s"ndv_$n") }: _*)
    // stack() fans the single joined row out to one row per column —
    // each aggregate still runs exactly once
    val arms = cols.map { case (n, _) =>
      s"'$n', n_rows, cnt_$n, ndv_$n, cast(min_$n as string), cast(max_$n as string)"
    }
    one.crossJoin(ndvs).select(expr(
      s"stack(${cols.size}, ${arms.mkString(", ")}) as " +
        "(column_name, n_rows, n_nonnull, n_distinct, min_val, max_val)"))
      .orderBy("column_name")
  }

  /** The oracle'd key: a six-column profile of `orders`. Doubles go
    * through the Money decimal so min/max render identically in both
    * engines; timestamps render as DATE (SURVEY §7.4 discipline).
    */
  val catalogColumnStats: Q = (s, dir) =>
    columnStats(table(s, dir, "orders"), Seq(
      ("o_orderkey", col("o_orderkey")),
      ("o_custkey", col("o_custkey")),
      ("o_orderstatus", col("o_orderstatus")),
      ("o_orderpriority", col("o_orderpriority")),
      ("o_totalprice", col("o_totalprice").cast(Money)),
      ("o_orderdate", col("o_orderdate").cast("date"))))

  val queries: Map[String, Q] = Map(
    "catalog_column_stats" -> catalogColumnStats,
  )
}
