package graft

import org.apache.spark.sql.functions._

/** Semantics of the concentration/burst/independence family: each key
  * re-derived by an independent in-JVM brute force on sf0.001 (the
  * DuckDB oracle covers cross-engine equality; these prove the MATH —
  * decile partitioning, calendar-range baselines, chi-square
  * invariants, bottom-k membership).
  */
class InsightsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("orders_pareto_share: deciles partition customers; cumulative share is monotone to exactly 1e6") {
    val rows = ops.Insights.ordersParetoShare(spark, dir).collect()
    val bySeg = rows.groupBy(_.getString(0))
    // population check: sum of decile customer counts = customers with >=1 order per segment
    val custCounts = graft.io.Readers.table(spark, dir, "orders")
      .join(graft.io.Readers.table(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(countDistinct("o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySeg.foreach { case (seg, ds) =>
      assert(ds.map(_.getLong(2)).sum === custCounts(seg), s"population $seg")
      // deciles 1..10 each present, cum share strictly increasing, ends at exactly 1e6
      assert(ds.map(_.getLong(1)).sorted.toSeq === (1L to 10L))
      val cums = ds.sortBy(_.getLong(1)).map(_.getLong(4)).toSeq
      assert(cums === cums.sorted)
      assert(cums.last === 1000000L, s"total share $seg")
      // concentration: the top decile's revenue mass >= the bottom decile's
      val revByDecile = ds.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(revByDecile.head >= revByDecile.last, s"Pareto direction $seg")
    }
  }

  test("events_burst_days: trailing baseline equals the brute-force calendar window") {
    val rows = ops.Insights.eventsBurstDays(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val daily = rows.groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    rows.foreach { case (typ, day, cnt, prev7, days7, burst) =>
      val window = (day - 7 to day - 1).flatMap(d => daily(typ).get(d))
      assert(prev7 === window.sum, s"$typ/$day prev7")
      assert(days7 === window.size.toLong, s"$typ/$day days7")
      val expected = if (days7 >= 4 && cnt * days7 > 2 * prev7) 1L else 0L
      assert(burst === expected, s"$typ/$day flag")
    }
    // the uniform synthetic corpus still exercises the early-history gate
    assert(rows.exists(_._5 < 4), "some rows lack full history")
  }

  test("stat_chi2_cells: marginals reconstruct, contributions match an independent double replay") {
    val rows = ops.Insights.statChi2Cells(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    // the FULL grid: every observed segment × every observed nation,
    // zero cells included (dropping them breaks Σe = n)
    assert(rows.length === rows.map(_._1).distinct.length * rows.map(_._2).distinct.length)
    assert(rows.exists(_._3 === 0L), "sf0.001 should have empty cells")
    val n = rows.map(_._3).sum
    val rowTot = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val colTot = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    rows.foreach { case (seg, nat, o, e, contrib) =>
      val eRef = (rowTot(seg) * colTot(nat)).toDouble / n.toDouble
      assert(e === eRef, s"e $seg/$nat") // bit-exact: same pinned op order
      val d = o.toDouble - eRef
      assert(contrib === d * d / eRef, s"contrib $seg/$nat")
      assert(contrib >= 0.0)
    }
    // expected counts sum back to n (within float tolerance only here —
    // this SUM is the consumer's fold, not part of the contract)
    assert(math.abs(rows.map(_._4).sum - n.toDouble) < 1e-6)
  }

  test("sample_bottomk_stratified: exactly k per stratum, membership = JDK-md5 bottom-k") {
    val rows = ops.Insights.sampleBottomkStratified(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3)))
    val all = graft.io.Readers.table(spark, dir, "customer")
      .select("c_mktsegment", "c_custkey").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    def jdkMd5(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    all.groupBy(_._1).foreach { case (seg, members) =>
      val expect = members.map { case (_, ck) => (jdkMd5(s"graft-bottomk|$ck"), ck) }
        .sorted.take(20).map(_._2).toSet
      val got = rows.filter(_._1 == seg)
      assert(got.length === math.min(20, members.length), s"k for $seg")
      assert(got.map(_._2).toSet === expect, s"membership $seg")
      // rank is the total-order prefix: 1..k without gaps
      assert(got.map(_._4).sorted.toSeq === (1 to got.length))
    }
  }

  test("sql_tpch_q5: every dimension joins broadcast; the fact pair shuffles once") {
    val plan = ops.Relational.sqlTpchQ5(spark, dir).queryExecution.executedPlan.toString
    // region, nation, supplier, customer all small enough to broadcast at test SF
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast dim joins")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    // one shuffle pair for orders ⋈ lineitem at most, plus the final agg
    assert(shuffles <= 4, s"too many hash exchanges in Q5 plan:\n$plan")
  }
}
