package graft.ops

import org.apache.spark.sql.functions._

import graft.io.Readers.table

/** Iterative graph analytics over warehouse-derived edge sets.
  *
  * Companion to [[Llm.connectedComponents]] (the other fixpoint
  * operator in the repo): where CC contracts the graph to a
  * forest, PageRank iterates a fixed number of synchronous
  * rank-propagation rounds — the Pregel pattern expressed as
  * DataFrame joins, with per-iteration `localCheckpoint` to keep the
  * plan from growing linearly in the iteration count.
  */
object Graph {

  import Relational.Q

  /** Fixed-iteration PageRank over the order-sequence part graph:
    * within each order, the part on line n links to the part on line
    * n+1 (a market-basket succession graph with natural skew —
    * popular parts accumulate in-links). 10 synchronous iterations,
    * damping 0.85, dangling mass dropped (the simplified/Pregel
    * formulation — deterministic, and identical in both engines).
    *
    * ARITHMETIC IS PURE INTEGER, by design: ranks live as
    * `rank · 10¹²` BIGINTs, contributions are `rq div deg`, damping
    * is `(85·s) div 100`. `round(double, 12)` is NOT usable here —
    * a rank divided by an even out-degree lands on an exact decimal
    * half with probability ~1/deg, exactly where Spark's HALF_UP
    * (exact expansion of the double) and DuckDB's float-multiply
    * rounding disagree; with ~300k divisions per run that's
    * thousands of coin flips. Integer div has no rounding mode at
    * all. The scaled sum is bounded by the total rank mass
    * (≈10¹² ≪ 2⁶³), and the single final `/ 10¹²` double cast is
    * exact (< 2⁵³).
    *
    * Scale: each iteration is one join of ranks to the (static) edge
    * relation + one partial-agg shuffle on dst — the standard
    * distributed PageRank economics. The edge relation is computed
    * once and `localCheckpoint`ed (reused 11×); rank relations are
    * checkpointed per iteration so the logical plan stays O(1) in
    * iterations instead of O(k)-deep join towers (same discipline as
    * [[Llm.connectedComponents]]). The only driver-side values are
    * two scalar counts.
    */
  val graphPagerank: Q = (s, dir) => {
    val li = table(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    val nxt = li.select(col("l_orderkey").as("ok"),
      col("l_linenumber").as("ln"), col("l_partkey").as("dst"))
    val edges = li.join(nxt,
        col("l_orderkey") === col("ok") &&
          col("ln") === col("l_linenumber") + 1 &&
          col("l_partkey") =!= col("dst"))
      .select(col("l_partkey").as("src"), col("dst"))
      .distinct()
      .localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count() // bounded driver scalar: one long
    val outd = edges.groupBy(col("src").as("onode"))
      .agg(count(lit(1)).as("deg"))
    var pr = nodes.select(col("node"), lit(1000000000000L / n).as("rq"))
      .localCheckpoint()
    val teleport = 150000000000L / n // 0.15 · 10¹² / n, exact integer
    (1 to 10).foreach { _ =>
      val contrib = pr
        .join(outd, col("node") === col("onode"))
        .join(edges, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(expr("rq div deg")).as("s"))
      pr = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr("(85 * coalesce(s, 0L)) div 100")).as("rq"))
        .localCheckpoint()
    }
    pr.orderBy(col("rq").desc, col("node"))
      .limit(20)
      .select(col("node"),
        (col("rq").cast("double") / 1000000000000L).as("rank"))
  }

  val queries: Map[String, Q] = Map(
    "graph_pagerank" -> graphPagerank,
  )
}
