package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.io.Readers.table

/** Data-layout operators (round 6): multi-dimensional clustering via a
  * Z-order (Morton) key.
  *
  * Why it's first-class at 100 TB: parquet row-group min/max stats can
  * only skip files when the data is CLUSTERED on the filtered columns.
  * A lexicographic sort clusters the first column perfectly and the
  * second not at all; interleaving the bits of both (the Z-curve)
  * keeps rows that are close in EITHER dimension close on disk, so
  * selective filters on either column prune row groups. This is the
  * standard layout trick behind Delta/Iceberg `ZORDER BY` — here it is
  * a plain deterministic Column expression plus a sort, nothing engine-
  * private.
  *
  * Scale shape: the key is a pure per-row bit expression (codegen'd,
  * no shuffle of its own); the clustering sort is the one
  * range-partitioned exchange any re-layout job pays. Writing through
  * [[graft.io.Sinks]] after [[sortByZ]] yields stat-prunable files.
  */
object Layout {

  import Relational.Q

  /** 16-bit × 16-bit Morton interleave: bit i of x lands at 2i, bit i
    * of y at 2i+1. Pure integer shifts/masks — whole-stage codegen
    * keeps all 32 terms in one generated function. Inputs are masked
    * to 16 bits; callers with wider domains bucket/normalize first
    * (rank- or range-normalization preserves locality, which is all
    * the curve needs).
    */
  def zorder16(x: Column, y: Column): Column = {
    val xb = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val yb = y.cast("long").bitwiseAND(lit(0xFFFFL))
    (0 until 16).map { i =>
      shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster a frame on the Z-curve over two columns (the re-layout
    * sort a compaction job runs before writing).
    */
  def sortByZ(df: DataFrame, x: String, y: String, tiebreak: Seq[String]): DataFrame =
    df.withColumn("zval", zorder16(col(x), col(y)))
      .orderBy(("zval" +: tiebreak).map(col): _*)

  /** The oracle'd key: lineitem keyed by the (l_partkey, l_suppkey)
    * Z-value — the layout sort's exact output, hash-checked against
    * the same 32-term bit formula in SQL. Round6OpsSpec separately
    * measures WHY: a probe on the SECOND column hits every chunk of a
    * lexicographic sort but only ~a quarter of the Z-sorted chunks.
    */
  val layoutZorderKey: Q = (s, dir) =>
    sortByZ(
      table(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      "l_partkey", "l_suppkey",
      tiebreak = Seq("l_orderkey", "l_linenumber"))
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "zval")

  /** Cluster a frame on the Hilbert curve over two columns — the
    * stronger-locality re-layout sort (see
    * [[graft.functions.NumericExpressions.Hilbert16]]).
    */
  def sortByHilbert(df: DataFrame, x: String, y: String,
      tiebreak: Seq[String]): DataFrame =
    df.withColumn("hval",
      graft.functions.NumericExpressions.hilbertD16(col(x), col(y)))
      .orderBy(("hval" +: tiebreak).map(col): _*)

  /** The Hilbert companion of [[layoutZorderKey]]: lineitem keyed by
    * the (l_partkey, l_suppkey) Hilbert index — same clustering
    * contract, with the curve's guaranteed unit-step adjacency
    * (consecutive key values are ALWAYS 2-D neighbors; the Z-curve
    * jumps at power-of-two seams). MEASURED HONESTLY against the
    * folklore (ExpressionsSpec A/B): at 64-chunk granularity on
    * uniform points the two curves prune band and rectangle probes
    * within a few chunks of each other in EITHER direction — the
    * spec asserts parity, not superiority; Hilbert's value is the
    * bounded worst case, and having BOTH keys lets a layout job pick
    * per-table on its own measured probes. The 16-round rotation
    * loop is a native codegen expression — a flat column formula
    * explodes exponentially under CollapseProject (scaladoc'd in
    * NumericExpressions.Hilbert16).
    */
  val layoutHilbertKey: Q = (s, dir) =>
    sortByHilbert(
      table(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      "l_partkey", "l_suppkey",
      tiebreak = Seq("l_orderkey", "l_linenumber"))
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "hval")

  val queries: Map[String, Q] = Map(
    "layout_zorder_key" -> layoutZorderKey,
    "layout_hilbert_key" -> layoutHilbertKey,
  )
}
