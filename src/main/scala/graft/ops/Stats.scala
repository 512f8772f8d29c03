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

  /** Per-group OLS regression (slope + intercept of
    * l_extendedprice ~ l_quantity per return flag) with the
    * decimal-exact-sums discipline that makes a FLOAT statistic
    * oracle-able: `covar_samp`/`regr_slope` accumulate doubles in
    * partition order (never cross-engine stable), so instead the
    * FIVE base aggregates (n, Σx, Σy, Σxy, Σx²) are exact decimal
    * sums — x at scale 0 (quantities are integral), y at scale 2,
    * so every scaled-int sum stays below 2⁵³ at bench SF and the
    * DECIMAL→DOUBLE casts are exactly rounded — and the closed-form
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²ᵗᵒᵗ)
    * is evaluated in IEEE doubles with the IDENTICAL expression tree
    * in both engines: correctly-rounded ops on identical operands are
    * bit-identical, no libm involved.
    *
    * Scale: one pass, all five aggregates algebraic with map-side
    * partials — the textbook two-phase agg; at 100 TB group sums
    * approach 2⁵³ and the decimal sums stay EXACT (38 digits), only
    * the final double cast would need widening to int128-safe
    * rationals — noted, not needed at any tested SF.
    */
  val statLinregGroup: Q = (s, dir) => {
    val xd = col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 0))
    val yd = col("l_extendedprice").cast(Money)
    table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(xd).cast("double").as("sx"),
        sum(yd).cast("double").as("sy"),
        sum(xd * yd).cast("double").as("sxy"),
        sum(xd * xd).cast("double").as("sxx"))
      .withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
      .withColumn("intercept", (col("sy") - col("slope") * col("sx")) / col("n"))
      .select(col("l_returnflag"), col("n"), col("slope"), col("intercept"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, Q] = Map(
    "catalog_column_stats" -> catalogColumnStats,
    "stat_linreg_group" -> statLinregGroup,
  )
}
