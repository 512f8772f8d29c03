package graft.ops

import org.apache.spark.sql.functions._

import graft.Determinism._
import graft.io.Readers.table

/** Sort / limit / top-k / set operations (SURVEY §2.6).
  *
  * Scale posture: global sorts are range-partitioned by Spark (sampled
  * boundaries — no single-node sort); `orderBy().limit(k)` plans as
  * TakeOrderedAndProject (per-partition top-k + driver merge of k·p
  * rows, never a full global sort); set ops are hash-partitioned
  * aggregates/joins under the hood.
  */
object SetSort {

  import Relational.Q

  /** Global multi-key sort, mixed directions, explicit null placement.
    * NULLs injected via nullif (source has none); Spark's asc default
    * is nulls-first and DuckDB's is nulls-last, so both sides pin
    * NULLS FIRST / LAST explicitly (SURVEY §7.4).
    */
  val sortMultikeyNulls: Q = (s, dir) =>
    table(s, dir, "part")
      .select(col("p_partkey"), nullif(col("p_brand"), lit("Brand#3")).as("brand_n"),
        col("p_size"), col("p_retailprice"))
      .orderBy(col("brand_n").desc_nulls_first, col("p_size").asc,
        col("p_partkey").asc)

  /** Global top-20 by price, unique-key tiebreak → TakeOrderedAndProject. */
  val limitTopkGlobal: Q = (s, dir) =>
    table(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  private def sliceA(s: org.apache.spark.sql.SparkSession, dir: String) =
    table(s, dir, "events")
      .filter(col("value") > 90)
      .select("event_id", "user_id", "event_type", "value")

  private def sliceB(s: org.apache.spark.sql.SparkSession, dir: String) =
    table(s, dir, "events")
      .filter(col("event_type") === "click")
      .select("event_id", "user_id", "event_type", "value")

  /** UNION ALL of two overlapping event slices (duplicates kept). */
  val setUnionAll: Q = (s, dir) =>
    sliceA(s, dir).unionByName(sliceB(s, dir)).transform(orderedByAll)

  /** UNION DISTINCT of the same slices (hash-dedup). */
  val setUnionDistinct: Q = (s, dir) =>
    sliceA(s, dir).unionByName(sliceB(s, dir)).distinct().transform(orderedByAll)

  /** Customers with orders in both 1996 and 1997 (INTERSECT = distinct). */
  val setIntersect: Q = (s, dir) => {
    val o = table(s, dir, "orders")
    val y96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey").as("custkey"))
    val y97 = o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey").as("custkey"))
    y96.intersect(y97).orderBy("custkey")
  }

  /** Customers with orders in 1996 but not 1997 (EXCEPT = distinct). */
  val setExcept: Q = (s, dir) => {
    val o = table(s, dir, "orders")
    val y96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey").as("custkey"))
    val y97 = o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey").as("custkey"))
    y96.except(y97).orderBy("custkey")
  }

  /** INTERSECT ALL + EXCEPT ALL — BAG semantics, the multiplicity-
    * preserving siblings of [[setIntersect]]/[[setExcept]] (a customer
    * with 3 orders in 1996 and 2 in 1997 contributes min(3,2) = 2
    * intersect rows and 3−2 = 1 except row; the DISTINCT forms erase
    * exactly this multiplicity information). One relation, both ops,
    * rolled up to (custkey, n_inter, n_exc) so the result is
    * total-ordered and the multiplicities are auditable directly.
    *
    * Catalyst plans both as aggregate-then-generate (count per key on
    * each side, then replicate min/diff times) — no row-by-row
    * matching; the rollup collapses the generated rows right back,
    * which is exactly why emitting counts (not the replicated bag) is
    * the honest surface for a gate. Scale: two pruned scans + one
    * shuffle each on custkey.
    */
  val setOpsBag: Q = (s, dir) => {
    val o = table(s, dir, "orders")
    val y96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey").as("custkey"))
    val y97 = o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey").as("custkey"))
    val inter = y96.intersectAll(y97)
      .groupBy("custkey").agg(count(lit(1)).as("n_inter"))
    val exc = y96.exceptAll(y97)
      .groupBy("custkey").agg(count(lit(1)).as("n_exc"))
    inter.join(exc, Seq("custkey"), "full_outer")
      .select(col("custkey"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        coalesce(col("n_exc"), lit(0L)).as("n_exc"))
      .orderBy("custkey")
  }

  val queries: Map[String, Q] = Map(
    "sort_multikey_nulls" -> sortMultikeyNulls,
    "limit_topk_global" -> limitTopkGlobal,
    "set_union_all" -> setUnionAll,
    "set_union_distinct" -> setUnionDistinct,
    "set_intersect" -> setIntersect,
    "set_except" -> setExcept,
    "set_ops_bag" -> setOpsBag,
  )
}
