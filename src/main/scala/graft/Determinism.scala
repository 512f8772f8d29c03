package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism discipline shared by every oracle'd query (SURVEY §7.4).
  *
  * Money/rate columns arrive as doubles with ≤2 decimal places
  * (FIXTURES.md). Summing raw doubles is association-order-dependent and
  * diverges between Spark and DuckDB, so oracle'd aggregates cast to
  * decimal (exact), aggregate, and cast the final value to DOUBLE.
  *
  * Scale discipline: money at scale 2 (values are exact), derived rate
  * factors at scale 4 (products of two 2-decimal values are exactly
  * 4-decimal). Money × rate sums land at scale ≤6, so the scaled
  * integer stays below 2^53 for realistic totals — both engines'
  * DECIMAL→DOUBLE casts are then exactly rounded and bit-identical.
  * (A scale-8 sum over ~5e8 overflows 2^53 in scaled-int terms and
  * DuckDB's int128/1e8 double cast loses ULPs — observed, avoided.)
  *
  * Ordering discipline: lineitem has NO unique key (even
  * (l_orderkey,l_linenumber) has duplicates — measured at sf0.01), so
  * row-level results ORDER BY every output column; fully identical rows
  * make tie order irrelevant to byte equality. Null ordering is pinned
  * to NULLS LAST on both sides (Spark asc default is nulls-first,
  * DuckDB's is nulls-last — never rely on either default).
  */
object Determinism {
  val Money: DecimalType = DecimalType(18, 2)
  val Rate: DecimalType = DecimalType(18, 4)

  /** Cast to exact money (scale 2 — source values are exact). */
  def dec(c: Column): Column = c.cast(Money)

  /** Cast a double-valued factor to exact rate (scale 4). */
  def rate(c: Column): Column = c.cast(Rate)

  /** Exact sum of a money column, returned as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact sum of money × factor: (18,2) × (18,4) → scale-6 product,
    * summed exactly, final single correctly-rounded cast to double.
    */
  def dsumProduct(money: Column, factor: Column): Column =
    sum(dec(money) * rate(factor)).cast("double")

  /** Deterministic average: exact decimal sum cast to double, divided by
    * the group count (double/long → identical IEEE division in both
    * engines).
    */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Total ordering over every output column, nulls last — the
    * tie-proof ordering for row-level results (see note above).
    */
  def orderedByAll(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(c => col(c).asc_nulls_last).toIndexedSeq: _*)
}
