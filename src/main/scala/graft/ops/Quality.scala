package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.io.Readers.table

/** Data-quality audit (round 11): the expectations table a pipeline
  * gate consumes — one row per rule with checked/violation counts and
  * an integer-ppm violation rate. Referential integrity across the
  * star schema plus domain rules, in one relation.
  *
  * Why it's first-class at 100 TB: every ingestion DAG runs exactly
  * this job between landing and publish (the "audit, then swap the
  * pointer" pattern — the same contract [[graft.io.TableManifest]]
  * commits under); a broken FK or domain drift caught here is 1000×
  * cheaper than caught downstream in a training run.
  */
object Quality {

  import Relational.Q

  /** One FK rule in ONE pass over the child: left-outer join against
    * the deduped parent key with a presence marker, then count rows
    * and orphans together (two separate anti-join + count subtrees
    * would scan the child twice).
    */
  private[graft] def fkRule(name: String, child: DataFrame, key: Column,
      parent: DataFrame, pkey: Column): DataFrame =
    child.select(key.as("k"))
      .join(parent.select(pkey.as("k")).distinct().withColumn("present", lit(1)),
        Seq("k"), "left_outer")
      .agg(count(lit(1)).as("n_checked"),
        count(when(col("present").isNull, 1)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_checked"), col("n_violations"))

  /** Domain rules over one table in ONE aggregate pass: each rule is a
    * conditional count; `stack` fans the single result row out to one
    * row per rule.
    */
  private[graft] def domainRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("n_checked") +:
      rules.zipWithIndex.map { case ((_, cond), i) =>
        count(when(cond, 1)).as(s"v_$i")
      }
    val arms = rules.zipWithIndex
      .map { case ((n, _), i) => s"'$n', n_checked, v_$i" }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${rules.size}, $arms) as (rule, n_checked, n_violations)"))
  }

  /** The audit relation: four FK reconciliations + four domain rules,
    * each row (rule, n_checked, n_violations, viol_ppm).
    *
    * Scale: every FK check is one shuffle join of the child's key
    * column against the DEDUPED parent key (skinny — 8 bytes/row; the
    * parent side dedup is map-side combined; Catalyst broadcasts when
    * a parent fits). Domain rules are one combined algebraic pass per
    * table — lineitem's two rules share a single scan via one
    * aggregate + stack, NOT two scans. The final union is 8 one-row
    * relations. At warehouse scale you run exactly this shape,
    * partition-incrementally, on each landed batch.
    */
  val dqAuditRules: Q = (s, dir) => {
    val lineitem = table(s, dir, "lineitem")
    val orders = table(s, dir, "orders")
    val part = table(s, dir, "part")
    val customer = table(s, dir, "customer")
    val nation = table(s, dir, "nation")
    val fk = Seq(
      fkRule("fk_lineitem_orderkey", lineitem, col("l_orderkey"),
        orders, col("o_orderkey")),
      fkRule("fk_lineitem_partkey", lineitem, col("l_partkey"),
        part, col("p_partkey")),
      fkRule("fk_orders_custkey", orders, col("o_custkey"),
        customer, col("c_custkey")),
      fkRule("fk_customer_nationkey", customer, col("c_nationkey"),
        nation, col("n_nationkey")))
    val dom = Seq(
      domainRules(lineitem, Seq(
        "dom_lineitem_quantity_pos" -> (col("l_quantity") <= 0),
        "dom_lineitem_discount_range" ->
          (col("l_discount") < 0 || col("l_discount") > 0.5))),
      domainRules(orders, Seq(
        "dom_orders_totalprice_pos" -> (col("o_totalprice") <= 0))),
      domainRules(table(s, dir, "documents"), Seq(
        "dom_documents_nonempty" ->
          (col("n_chars") <= 0 || length(trim(col("text"))) === 0))))
    (fk ++ dom).reduce(_ unionByName _)
      .withColumn("viol_ppm", expr("n_violations * 1000000 div n_checked"))
      .orderBy(col("rule"))
  }

  val queries: Map[String, Q] = Map(
    "dq_audit_rules" -> dqAuditRules,
  )
}
