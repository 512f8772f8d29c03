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

  // shared brute-force input for the two-sample tests: per segment,
  // the exact cent values, re-derived independently of Readers' path
  private def balCentsBySeg: Map[String, Array[Long]] =
    graft.io.Readers.table(spark, dir, "customer")
      .select(col("c_mktsegment"),
        (graft.Determinism.dec(col("c_acctbal")) * 100).cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  test("stat_mann_whitney: doubled rank sums match an average-rank replay; U identities hold") {
    val rows = ops.Insights.statMannWhitney(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    val segs = balCentsBySeg
    val expectPairs = for {
      a <- segs.keys; b <- segs.keys if a < b
    } yield (a, b)
    assert(rows.keySet === expectPairs.toSet)
    rows.foreach { case ((a, b), (nA, nB, r2A, u2A, u2B)) =>
      val (va, vb) = (segs(a), segs(b))
      assert(nA === va.length.toLong && nB === vb.length.toLong)
      // average-rank replay: tie group at positions lo..hi has
      // 2*avgrank = lo + hi for every member
      val combined = (va.map((_, 'a')) ++ vb.map((_, 'b'))).sortBy(_._1)
      var pos = 0
      var r2 = 0L
      combined.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, grp) =>
        val lo = pos + 1L
        val hi = pos + grp.length.toLong
        r2 += (lo + hi) * grp.count(_._2 == 'a')
        pos += grp.length
      }
      assert(r2A === r2, s"rank sum $a/$b")
      assert(u2A === r2A - nA * (nA + 1), s"U definition $a/$b")
      assert(u2A + u2B === 2L * nA * nB, s"U complement identity $a/$b")
    }
  }

  test("stat_ks_test: D numerator and location match a full-ECDF scan") {
    val rows = ops.Insights.statKsTest(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    val segs = balCentsBySeg
    rows.foreach { case ((a, b), (nA, nB, dNum, dDen, ksAt)) =>
      val (va, vb) = (segs(a).sorted, segs(b).sorted)
      assert(nA === va.length.toLong && nB === vb.length.toLong)
      assert(dDen === nA * nB)
      val values = (va ++ vb).distinct.sorted
      val scan = values.map { v =>
        val cumA = va.count(_ <= v).toLong
        val cumB = vb.count(_ <= v).toLong
        (math.abs(nB * cumA - nA * cumB), v)
      }
      val best = scan.maxBy(_._1)._1
      assert(dNum === best, s"D numerator $a/$b")
      assert(ksAt === scan.filter(_._1 == best).map(_._2).min, s"tie location $a/$b")
      // ECDF gap never exceeds its bound n_a*n_b
      assert(dNum <= dDen, s"normalized D > 1 for $a/$b")
    }
  }

  test("events_cusum_changepoint: deviation and argmax match a daily-count replay") {
    val rows = ops.Insights.eventsCusumChangepoint(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    val daily = graft.io.Readers.table(spark, dir, "events")
      .select(col("event_type"), unix_date(to_date(col("ts"))).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.length.toLong).toMap).toMap
    assert(rows.keySet === daily.keySet)
    rows.foreach { case (typ, (d0, d1, span, total, cpDay, cumAtCp, devNum)) =>
      val counts = daily(typ)
      assert(d0 === counts.keys.min && d1 === counts.keys.max)
      assert(span === d1 - d0 + 1 && total === counts.values.sum)
      val scan = counts.keys.toSeq.sorted.map { d =>
        val cum = counts.filter(_._1 <= d).values.sum
        (math.abs(span * cum - total * (d - d0 + 1)), d, cum)
      }
      val best = scan.maxBy(_._1)._1
      val winner = scan.filter(_._1 == best).minBy(_._2)
      assert(devNum === best, s"deviation $typ")
      assert(cpDay === winner._2 && cumAtCp === winner._3, s"argmax $typ")
    }
  }

  /** Per-customer (cohort, lifetime, censored) replay shared by the
    * two survival tests.
    */
  private def survivalLives: Seq[(String, Long, Boolean)] = {
    val orders = graft.io.Readers.table(spark, dir, "orders")
      .select(col("o_custkey"), unix_date(to_date(col("o_orderdate"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val seg = graft.io.Readers.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val dmax = orders.map(_._2).max
    orders.groupBy(_._1).map { case (ck, os) =>
      val d0 = os.map(_._2).min
      val d1 = os.map(_._2).max
      (seg(ck), d1 - d0, d1 > dmax - 90)
    }.toSeq
  }

  test("orders_survival_km: risk sets and censoring match a per-customer replay") {
    val rows = ops.Insights.ordersSurvivalKm(spark, dir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val life = survivalLives
    // censoring must actually split the population (a 100%-censored
    // corpus would make every downstream statistic vacuous)
    assert(life.exists(_._3) && life.exists(!_._3), "both fates present")
    assert(rows.keySet === life.map(l => (l._1, l._2)).toSet)
    rows.foreach { case ((coh, t), (nRisk, dEvent, cCensor)) =>
      val cohLives = life.filter(_._1 == coh)
      assert(nRisk === cohLives.count(_._2 >= t).toLong, s"risk set $coh/$t")
      assert(dEvent === cohLives.count(l => l._2 == t && !l._3).toLong, s"events $coh/$t")
      assert(cCensor === cohLives.count(l => l._2 == t && l._3).toLong, s"censored $coh/$t")
    }
    // KM invariant: risk set at the smallest lifetime = cohort size
    rows.keys.map(_._1).toSeq.distinct.foreach { coh =>
      val tMin = rows.keys.filter(_._1 == coh).map(_._2).min
      assert(rows((coh, tMin))._1 === life.count(_._1 == coh).toLong, s"cohort size $coh")
    }
  }

  test("stat_logrank_cells: O/E/V cells match a direct risk-set replay; identities hold") {
    val rows = ops.Insights.statLogrankCells(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getLong(8), r.getLong(9))))
      .toMap
    assert(rows.nonEmpty, "death times must exist")
    val life = survivalLives
    val cohorts = life.map(_._1).distinct.sorted
    val expectKeys = for {
      a <- cohorts; b <- cohorts if a < b
      t <- life.filter(l => (l._1 == a || l._1 == b) && !l._3).map(_._2).distinct
    } yield (a, b, t)
    assert(rows.keySet === expectKeys.toSet, "exactly the pair death times")
    rows.foreach { case ((a, b, t), (oA, nA, nB, eNum, eDen, vNum, vDen)) =>
      val la = life.filter(_._1 == a)
      val lb = life.filter(_._1 == b)
      val dA = la.count(l => l._2 == t && !l._3).toLong
      val dB = lb.count(l => l._2 == t && !l._3).toLong
      val rA = la.count(_._2 >= t).toLong
      val rB = lb.count(_._2 >= t).toLong
      val d = dA + dB
      val n = rA + rB
      assert(oA === dA && nA === rA && nB === rB, s"counts $a/$b/$t")
      assert(eNum === rA * d && eDen === n, s"expectation $a/$b/$t")
      assert(vNum === d * rA * rB * (n - d) && vDen === n * n * (n - 1), s"variance $a/$b/$t")
    }
  }

  test("graph_degree_hist: bins partition the node set; bit-length binning is exact") {
    val hist = ops.Graph.graphDegreeHist(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val d0 = ops.Graph.orderSequenceEdges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = (d0 ++ d0.map(_.swap)).distinct.groupBy(_._1).view.mapValues(_.length.toLong)
    val expect = deg.values.toSeq.groupBy(d => 63 - java.lang.Long.numberOfLeadingZeros(d))
    assert(hist.map(_._1).toSet === expect.keySet.map(_.toLong))
    hist.foreach { case (bin, n, mn, mx, mass) =>
      val ds = expect(bin.toInt)
      assert(n === ds.length.toLong && mn === ds.min && mx === ds.max && mass === ds.sum,
        s"bin $bin")
      // bin really is floor(log2): every degree in [2^bin, 2^(bin+1))
      assert(mn >= (1L << bin) && mx < (1L << (bin + 1)), s"bin bounds $bin")
    }
    assert(hist.map(_._2).sum === deg.size.toLong, "bins partition the nodes")
  }

  test("sql_tpch_q5: every dimension joins broadcast; the fact pair shuffles once") {
    val plan = ops.Relational.sqlTpchQ5(spark, dir).queryExecution.executedPlan.toString
    // region, nation, supplier, customer all small enough to broadcast at test SF
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast dim joins")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    // one shuffle pair for orders ⋈ lineitem at most, plus the final agg
    assert(shuffles <= 4, s"too many hash exchanges in Q5 plan:\n$plan")
  }

  test("stat_kruskal_wallis: pairwise decomposition equals brute-force pooled midranks") {
    val rows = ops.Insights.statKruskalWallis(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val segs = balCentsBySeg
    // brute force: pool EVERYTHING, assign doubled midranks (lo + hi
    // per tie group), sum per segment — the global window the engine
    // plan is forbidden to run
    val pooled = segs.toSeq.flatMap { case (g, vs) => vs.map(v => (v, g)) }.sortBy(_._1)
    val r2BySeg = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    var pos = 0
    pooled.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, grp) =>
      val lo = pos + 1L
      val hi = pos + grp.length.toLong
      grp.foreach { case (_, g) => r2BySeg(g) += lo + hi }
      pos += grp.length
    }
    val n = pooled.length.toLong
    val tie3 = pooled.groupBy(_._1).values
      .map(g => { val t = g.length.toLong; t * t * t - t }).sum
    assert(rows.map(_._1).toSet === segs.keySet)
    rows.foreach { case (g, nG, r2G, nTotal, tie3Sum) =>
      assert(nG === segs(g).length.toLong, s"n_g $g")
      assert(r2G === r2BySeg(g), s"pooled doubled rank sum $g")
      assert(nTotal === n && tie3Sum === tie3, s"globals $g")
    }
    // the sum-of-rank-sums invariant: Σ 2R_g = N(N+1)
    assert(rows.map(_._3).sum === n * (n + 1), "rank sums partition the pool")
  }

  test("stat_spearman_cells: moment sums match a midrank replay; marginal identity holds") {
    val rows = ops.Insights.statSpearmanCells(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // independent replay: per segment, (bal, revenue) per customer with
    // no-order customers at revenue 0, doubled midranks on each axis
    val rev = graft.io.Readers.table(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg((sum(graft.Determinism.dec(col("o_totalprice"))) * 100).cast("long").as("rc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cust = graft.io.Readers.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        (graft.Determinism.dec(col("c_acctbal")) * 100).cast("long"))
      .collect().map(r => (r.getString(1), r.getLong(2), rev.getOrElse(r.getLong(0), 0L)))
    def doubledMidranks(vs: Seq[Long]): Map[Long, Long] = {
      // value → 2·midrank = lo + hi of its tie block
      val sorted = vs.sorted
      var pos = 0
      sorted.groupBy(identity).toSeq.sortBy(_._1).map { case (v, grp) =>
        val lo = pos + 1L; val hi = pos + grp.length.toLong
        pos += grp.length
        v -> (lo + hi)
      }.toMap
    }
    val bySeg = cust.groupBy(_._1)
    assert(rows.map(_._1).toSet === bySeg.keySet)
    rows.foreach { case (seg, n, sXy, sXx, sYy) =>
      val ds = bySeg(seg)
      val rx = doubledMidranks(ds.map(_._2).toSeq)
      val ry = doubledMidranks(ds.map(_._3).toSeq)
      val pairs = ds.map { case (_, x, y) => (rx(x), ry(y)) }
      assert(n === ds.length.toLong, s"n $seg")
      assert(sXy === pairs.map { case (a, b) => a * b }.sum, s"s_xy $seg")
      assert(sXx === pairs.map { case (a, _) => a * a }.sum, s"s_xx $seg")
      assert(sYy === pairs.map { case (_, b) => b * b }.sum, s"s_yy $seg")
      // marginal identity Σ r2 = n(n+1) on both axes (tie-invariant)
      assert(pairs.map(_._1).sum === n * (n + 1) && pairs.map(_._2).sum === n * (n + 1))
      // and the derived ρ is a valid correlation
      val num = (n * sXy - n * n * (n + 1) * (n + 1)).toDouble
      val den = math.sqrt((n * sXx - n * n * (n + 1) * (n + 1)).toDouble) *
        math.sqrt((n * sYy - n * n * (n + 1) * (n + 1)).toDouble)
      val rho = num / den
      assert(rho >= -1.0 && rho <= 1.0, s"rho $seg = $rho")
    }
  }

  test("events_gini_activity: integer rational matches the sorted-weights replay; G in [0,1)") {
    val rows = ops.Insights.eventsGiniActivity(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val perUser = graft.io.Readers.table(spark, dir, "events")
      .groupBy(col("event_type"), col("user_id")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = perUser.groupBy(_._1)
    assert(rows.map(_._1).toSet === byType.keySet)
    rows.foreach { case (t, n, total, gNum, gDen) =>
      val cs = byType(t).sortBy(u => (u._3, u._2)).map(_._3) // the key's total order
      assert(n === cs.length.toLong && total === cs.sum)
      val expected = cs.zipWithIndex.map { case (c, i) => (2L * (i + 1) - n - 1) * c }.sum
      assert(gNum === expected, s"g_num $t")
      assert(gDen === n * total)
      assert(gNum >= 0 && gNum < gDen, s"G bounds $t")
    }
  }

  test("events_type_overlap: full grid, set-replay intersections, inclusion-exclusion") {
    val rows = ops.Insights.eventsTypeOverlap(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    val ut = graft.io.Readers.table(spark, dir, "events")
      .select(col("event_type"), col("user_id")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val users = ut.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = users.keySet.toSeq.sorted
    // every unordered pair appears exactly once — including any with
    // zero overlap
    assert(rows.map(_._1).toSet ===
      (for (a <- types; b <- types if a < b) yield (a, b)).toSet)
    rows.foreach { case ((a, b), (nA, nB, inter, union)) =>
      assert(nA === users(a).size.toLong && nB === users(b).size.toLong)
      assert(inter === users(a).intersect(users(b)).size.toLong, s"inter $a/$b")
      assert(union === users(a).union(users(b)).size.toLong, s"union $a/$b")
    }
  }

  test("orders_cohort_ltv: age-0 row IS the cohort; ramp is monotone; revenue conserves") {
    val rows = ops.Insights.ordersCohortLtv(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (c, ds) =>
      val sorted = ds.sortBy(_._2)
      // every member's first order is in the cohort month ⇒ age 0 exists
      // and its active count equals the cohort size
      assert(sorted.head._2 === 0L, s"age-0 row $c")
      assert(sorted.head._3 === sorted.head._6, s"age-0 actives = cohort size $c")
      assert(ds.forall(_._3 <= ds.head._6), s"actives never exceed size $c")
      // the ramp is the running sum of the per-age revenue
      assert(sorted.map(_._4).scanLeft(0L)(_ + _).tail.toSeq ===
        sorted.map(_._5).toSeq, s"cumulative ramp $c")
    }
    // conservation: revenue lands in exactly one (cohort, age) cell
    val total = graft.io.Readers.table(spark, dir, "orders")
      .agg((sum(graft.Determinism.dec(col("o_totalprice"))) * 100).cast("long"))
      .collect()(0).getLong(0)
    assert(rows.map(_._4).sum === total, "total revenue conserves")
    // and every customer is in exactly one cohort
    val nCust = graft.io.Readers.table(spark, dir, "orders")
      .select("o_custkey").distinct().count()
    assert(byCohort.values.map(_.head._6).sum === nCust)
  }

  test("orders_theil_decomposition: between + within reconstruct the pooled Theil index") {
    import graft.functions.NumericExpressions.log2FixedJ
    val rows = ops.Insights.ordersTheilDecomposition(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val xs = graft.io.Readers.table(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg((sum(graft.Determinism.dec(col("o_totalprice"))) * 100).cast("long").as("x"))
      .collect().map(_.getLong(1))
    val n = xs.length.toLong
    val xTot = xs.sum
    assert(rows.forall(r => r._6 === n && r._7 === xTot), "globals")
    assert(rows.map(_._2).sum === n && rows.map(_._3).sum === xTot, "marginals")
    // the pooled Theil numerator, replayed directly in-JVM on the same
    // fixed-point kernel: T·X·2^20 = Σ x·(L(x·N) − L(X))
    val tDirect = xs.map(x => x * (log2FixedJ(x * n) - log2FixedJ(xTot))).sum
    val tDecomposed = rows.map(_._4).sum + rows.map(_._5).sum
    val scale = xTot.toDouble * (1L << 20)
    assert(math.abs(tDirect - tDecomposed) / scale < 1e-4,
      s"decomposition residual ${math.abs(tDirect - tDecomposed) / scale}")
    // inequality components are nonnegative (up to log tolerance)
    val tol = (6.0 / (1L << 20)) * xTot // ±3e-6·2^20 per log, two logs
    assert(rows.forall(_._4 >= -tol), "within >= 0")
    assert(rows.map(_._5).sum >= -tol, "between >= 0")
    // and the index is genuinely positive on this corpus
    assert(tDecomposed > 0, "pooled inequality positive")
  }

  test("orders_fulfillment_lag: lag cells match an interval replay; rank conventions hold") {
    val rows = ops.Insights.ordersFulfillmentLag(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val iv = graft.io.Readers.table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(max(unix_date(to_date(col("l_shipdate")))).cast("long").as("c"))
      .join(graft.io.Readers.table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          unix_date(to_date(col("o_orderdate"))).cast("long").as("o")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), col("o_orderkey"),
        (greatest(col("c"), col("o")) - col("o")).as("lag"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byPrio = iv.groupBy(_._1)
    assert(rows.map(_._1).toSet === byPrio.keySet)
    rows.foreach { case (p, n, sumL, med, p90, maxL) =>
      val g = byPrio(p)
      assert(n === g.length.toLong)
      assert(sumL === g.map(_._3).sum)
      assert(maxL === g.map(_._3).max)
      val sorted = g.sortBy(t => (t._3, t._2)).map(_._3)
      assert(med === sorted((g.length + 1) / 2 - 1), s"median $p")
      assert(p90 === sorted((9 * g.length + 9) / 10 - 1), s"p90 $p")
      assert(med <= p90 && p90 <= maxL, s"order statistics ordered $p")
    }
  }

  test("stat_bootstrap_ci: deterministic replicates, CI brackets the exact mean, width sane") {
    val run1 = ops.Insights.statBootstrapCi(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    // seeded determinism: a second evaluation is bit-identical
    val run2 = ops.Insights.statBootstrapCi(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(run1.toSeq === run2.toSeq, "seeded bootstrap must be run-stable")
    val o = graft.io.Readers.table(spark, dir, "orders")
      .join(graft.io.Readers.table(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        (graft.Determinism.dec(col("o_totalprice")) * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bySeg = o.groupBy(_._1)
    assert(run1.map(_._1).toSet === bySeg.keySet)
    run1.foreach { case (seg, n, mean, lo, hi) =>
      val vs = bySeg(seg).map(_._2)
      assert(n === vs.length.toLong)
      val exact = vs.sum.toDouble / vs.length
      assert(math.abs(mean - exact) < 1e-6, s"exact mean $seg")
      assert(lo < hi, s"CI ordered $seg")
      assert(lo <= exact && exact <= hi, s"95% CI brackets the true mean $seg")
      // width ~ 4·σ/√n: sane upper bound at 6·σ/√n, lower at σ/√n
      val sd = math.sqrt(vs.map(v => math.pow(v - exact, 2)).sum / vs.length)
      val se = sd / math.sqrt(vs.length.toDouble)
      assert(hi - lo < 6 * se && hi - lo > se, s"CI width $seg: ${hi - lo} vs se $se")
    }
  }

  test("events_stickiness: exact DAU/MAU replay; window bounds hold") {
    val rows = ops.Insights.eventsStickiness(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val du = graft.io.Readers.table(spark, dir, "events")
      .select(unix_date(to_date(col("ts"))).cast("long"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val days = du.map(_._1).distinct.sorted
    assert(rows.map(_._1).toSeq === days.toSeq)
    rows.foreach { case (d, dau, mau) =>
      assert(dau === du.count(_._1 == d).toLong, s"dau at $d")
      val want = du.filter(t => t._1 >= d - 29 && t._1 <= d).map(_._2).distinct.length
      assert(mau === want.toLong, s"mau30 at $d")
      assert(dau <= mau, "a day's actives are inside its window")
    }
  }

  test("events_decay_engagement: exact fixed-point replay; decay tracks the true exponential") {
    val rows = ops.Insights.eventsDecayEngagement(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val e = graft.io.Readers.table(spark, dir, "events")
      .select(col("event_type"), col("user_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val now = e.map(_._3).max
    def w20(us: Long): Long = {
      val ageD = (now - us) / 86400000000L
      val h = math.min(ageD * 1048576L / 7L, 42L * 1048576L)
      1099511627776L / graft.functions.NumericExpressions.exp2FixedJ(h)
    }
    val scores = e.groupBy(t => (t._1, t._2)).map { case ((ty, u), g) =>
      (ty, u) -> (g.length.toLong, g.map(t => w20(t._3)).sum) }
    rows.foreach { case (ty, rn, u, n, s20) =>
      assert(scores((ty, u)) === ((n, s20)), s"exact replay ($ty,$u)")
      assert(rn >= 1 && rn <= 10)
      // fixed-point tracks the true 2^(-age/7) decay within fp granularity
      val trueScore = e.filter(t => t._1 == ty && t._2 == u)
        .map(t => math.pow(2.0, -(((now - t._3) / 86400000000L).toDouble / 7.0)))
        .sum
      assert(math.abs(s20 / 1048576.0 - trueScore) < 0.15 * math.max(1.0, trueScore),
        s"decay sanity ($ty,$u): ${s20 / 1048576.0} vs $trueScore")
    }
    // top-10 head property per type
    rows.groupBy(_._1).foreach { case (ty, rs) =>
      val emitted = rs.map(_._3).toSet
      val bestOut = scores.collect {
        case ((t, u), (_, s)) if t == ty && !emitted(u) => s }
      if (bestOut.nonEmpty)
        assert(rs.map(_._5).min >= bestOut.max, s"head property $ty")
    }
  }

  test("orders_mix_drift: fixed-point KL tracks a double-precision replay; nonnegative") {
    val rows = ops.Insights.ordersMixDrift(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val o = graft.io.Readers.table(spark, dir, "orders")
      .select(date_format(to_date(col("o_orderdate")), "yyyy-MM"), col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val global = o.groupBy(_._2).map { case (p, g) => p -> g.length.toDouble }
    val nTot = o.length.toDouble
    val byMonth = o.groupBy(_._1)
    assert(rows.map(_._1).toSet === byMonth.keySet)
    rows.foreach { case (m, n, kl) =>
      val g = byMonth(m)
      assert(n === g.length.toLong)
      val ref = g.groupBy(_._2).map { case (p, cells) =>
        val pm = cells.length.toDouble / g.length
        val q = global(p) / nTot
        cells.length.toDouble / g.length * (math.log(pm / q) / math.log(2.0))
      }.sum
      assert(math.abs(kl - ref) < 1e-4, s"KL $m: $kl vs $ref")
      assert(kl >= -1e-9, s"KL must be nonnegative at $m")
    }
  }

  test("stat_levene_cells: deviations about the lower median match a replay; sumsq exact") {
    val rows = ops.Insights.statLeveneCells(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        BigInt(r.getString(4))))
    val o = graft.io.Readers.table(spark, dir, "orders")
      .join(graft.io.Readers.table(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"),
        (graft.Determinism.dec(col("o_totalprice")) * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySeg = o.groupBy(_._1)
    assert(rows.map(_._1).toSet === bySeg.keySet)
    rows.foreach { case (seg, n, med, sumD, sumSq) =>
      val g = bySeg(seg)
      assert(n === g.length.toLong)
      val wantMed = g.sortBy(t => (t._3, t._2)).apply((g.length + 1) / 2 - 1)._3
      assert(med === wantMed, s"median convention $seg")
      val devs = g.map(t => math.abs(t._3 - wantMed))
      assert(sumD === devs.sum, s"sum dev $seg")
      assert(sumSq === devs.map(d => BigInt(d) * BigInt(d)).sum, s"sumsq $seg")
    }
  }

  test("stat_anova_cells: moments match a brute-force replay; sumsq string is the exact big integer") {
    val rows = ops.Insights.statAnovaCells(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), BigInt(r.getString(3))))
    val o = graft.io.Readers.table(spark, dir, "orders")
      .join(graft.io.Readers.table(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        (graft.Determinism.dec(col("o_totalprice")) * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bySeg = o.groupBy(_._1)
    assert(rows.map(_._1).toSet === bySeg.keySet)
    rows.foreach { case (seg, n, s1, s2) =>
      val vs = bySeg(seg).map(_._2)
      assert(n === vs.length.toLong, s"n $seg")
      assert(s1 === vs.sum, s"sum $seg")
      assert(s2 === vs.map(v => BigInt(v) * BigInt(v)).sum, s"sumsq $seg")
    }
  }

  test("events_interarrival: gaps match a per-user sequential replay; median convention holds") {
    val rows = ops.Insights.eventsInterarrival(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val e = graft.io.Readers.table(spark, dir, "events")
      .select(col("event_type"), col("user_id"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // per (type, user): sort by (us, event_id), successive diffs tagged
    // with the LATER event's id (the median tie-break key)
    val gaps = e.groupBy(t => (t._1, t._2)).toSeq.flatMap { case ((ty, _), g) =>
      val s = g.sortBy(t => (t._3, t._4))
      s.zip(s.tail).map { case (a, b) => (ty, b._3 - a._3, b._4) }
    }
    val byType = gaps.groupBy(_._1)
    assert(rows.map(_._1).toSet === byType.keySet.filter(t => byType(t).nonEmpty))
    rows.foreach { case (ty, nUsers, nGaps, sumG, medG, maxG) =>
      val g = byType(ty)
      assert(nGaps === g.length.toLong, s"n_gaps $ty")
      assert(sumG === g.map(_._2).sum, s"sum $ty")
      assert(maxG === g.map(_._2).max, s"max $ty")
      val ordered = g.sortBy(t => (t._2, t._3))
      assert(medG === ordered((g.length + 1) / 2 - 1)._2, s"median $ty")
      val usersWithRepeat = e.groupBy(t => (t._1, t._2))
        .count { case ((t, _), grp) => t == ty && grp.length >= 2 }
      assert(nUsers === usersWithRepeat.toLong, s"n_users $ty")
    }
  }

  test("orders_open_backlog: equals a brute-force interval count; endpoint + conservation invariants") {
    val rows = ops.Insights.ordersOpenBacklog(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val iv = graft.io.Readers.table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(max(unix_date(to_date(col("l_shipdate")))).cast("long").as("c"))
      .join(graft.io.Readers.table(spark, dir, "orders")
        .select(col("o_orderkey"), unix_date(to_date(col("o_orderdate"))).cast("long").as("o")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o"), greatest(col("c"), col("o")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val lo = iv.map(_._1).min; val hi = iv.map(_._2).max
    assert(rows.map(_._1).toSeq === (lo to hi).toSeq, "spine is the full closed range")
    rows.foreach { case (d, opened, closed, backlog) =>
      assert(backlog === iv.count { case (o, c) => o <= d && d <= c }.toLong,
        s"backlog at $d")
      assert(opened === iv.count(_._1 == d).toLong, s"opened at $d")
      assert(closed === iv.count(_._2 == d).toLong, s"closed at $d")
      assert(backlog >= 0L)
    }
    assert(rows.map(_._2).sum === iv.length.toLong, "every order opens once")
    assert(rows.map(_._3).sum === iv.length.toLong, "every order closes once")
    val last = rows.last
    assert(last._4 === last._3, "final-day backlog = final-day closes")
  }

  test("orders_benford_digits: full grid, totals conserve, lexical digit matches arithmetic leading digit") {
    val rows = ops.Insights.ordersBenfordDigits(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byPrio = rows.groupBy(_._1)
    // full 9-cell grid per priority, zero cells included
    byPrio.foreach { case (p, cells) =>
      assert(cells.map(_._2).sorted.toSeq === (1L to 9L), s"grid incomplete for $p")
      assert(cells.map(_._3).sum === cells.head._4, s"observed counts must sum to prio_tot for $p")
      assert(cells.map(_._4).distinct.length === 1, s"prio_tot constant within $p")
    }
    // brute-force replay: leading digit of the cents value, arithmetic form
    val o = graft.io.Readers.table(spark, dir, "orders")
      .select(col("o_orderpriority"),
        (graft.Determinism.dec(col("o_totalprice")) * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def lead(v: Long): Long = { var x = v; while (x >= 10) x /= 10; x }
    val want = o.groupBy(t => (t._1, lead(t._2))).map { case (k, g) => k -> g.length.toLong }
    rows.foreach { case (p, d, obs, _) =>
      assert(obs === want.getOrElse((p, d), 0L), s"cell ($p,$d)")
    }
    assert(rows.map(_._3).sum === o.length.toLong, "grand total conserves")
  }

  test("orders_runs_test: runs match a sequential replay; lower-median conventions hold") {
    val rows = ops.Insights.ordersRunsTest(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val o = graft.io.Readers.table(spark, dir, "orders")
      .join(graft.io.Readers.table(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"),
        unix_date(to_date(col("o_orderdate"))).cast("long"),
        (graft.Determinism.dec(col("o_totalprice")) * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val bySeg = o.groupBy(_._1)
    assert(rows.map(_._1).toSet === bySeg.keySet)
    rows.foreach { case (seg, nPlus, nMinus, runs) =>
      val ds = bySeg(seg)
      // lower median at rank (n+1) div 2 in (v, orderkey) order
      val byVal = ds.sortBy(t => (t._4, t._2))
      val med = byVal((ds.length + 1) / 2 - 1)._4
      val seq = ds.sortBy(t => (t._3, t._2)).map(t => if (t._4 > med) 1L else 0L)
      assert(nPlus === seq.count(_ == 1L).toLong, s"n_plus $seg")
      assert(nMinus === seq.count(_ == 0L).toLong, s"n_minus $seg")
      val expectedRuns = 1L + seq.sliding(2).count(w => w.length == 2 && w(0) != w(1))
      assert(runs === expectedRuns, s"runs $seg")
      // conventions: population splits, runs bounded, ties-to-below
      // keeps the above side the strictly smaller-or-equal half
      assert(nPlus + nMinus === ds.length.toLong)
      assert(runs >= 1 && runs <= ds.length.toLong)
      assert(nPlus <= nMinus, s"ties-to-below keeps n_plus <= n_minus $seg")
    }
  }

  test("events_hhi_concentration: JVM replay; 1/n <= hhi <= 1 and the uniform bound binds") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val pu = io.Readers.table(spark, dir, "events")
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val got = ops.Insights.eventsHhiConcentration(spark, dir).collect()
    val byType = pu.groupBy(_._1)
    assert(got.map(_.getString(0)).toSet === byType.keySet)
    got.foreach { r =>
      val cs = byType(r.getString(0)).map(_._2)
      val (n, tot, sq) = (cs.length.toLong, cs.sum, cs.map(c => c * c).sum)
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((n, tot, sq)))
      val hhi = r.getDouble(4)
      assert(hhi === sq.toDouble / (tot.toDouble * tot.toDouble))
      // Cauchy–Schwarz lower bound (equality iff uniform) and the max
      assert(hhi >= 1.0 / n - 1e-12 && hhi <= 1.0 + 1e-12, s"hhi $hhi n $n")
    }
  }

  test("events_snaive_backtest: brute-force calendar-lag replay; gap days contribute no row") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val daily = io.Readers.table(spark, dir, "events")
      .select(col("event_type"), unix_date(to_date(col("ts"))).cast("long").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = daily.groupBy(_._1).map { case (t, rs) =>
      t -> rs.map(r => r._2 -> r._3).toMap
    }
    val got = ops.Insights.eventsSnaiveBacktest(spark, dir).collect()
    assert(got.map(_.getString(0)).toSet === byType.keySet)
    got.foreach { r =>
      val m = byType(r.getString(0))
      def cells(k: Int) = {
        val evals = m.keys.toSeq.filter(d => m.contains(d - k)).sorted
        val errs = evals.map(d => m(d) - m(d - k))
        (evals.length.toLong, errs.map(math.abs).sum, errs.sum,
          if (errs.isEmpty) 0L else errs.map(math.abs).max)
      }
      val (n7, sae7, b7, mx7) = cells(7)
      val (n1, sae1, b1, mx1) = cells(1)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) === ((n7, sae7, b7, mx7)))
      assert((r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)) === ((n1, sae1, b1, mx1)))
      val sumActual7 = m.keys.toSeq.filter(d => m.contains(d - 7)).map(m).sum
      assert(r.getLong(9) === sumActual7)
    }
  }

  test("events_peak_concurrency: brute-force timeline sweep replay; conservation holds") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val ev = io.Readers.table(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference sessionization: 30-min gap per user in (ts, event_id) order
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var (a, b) = (sorted.head._2, sorted.head._2)
      sorted.tail.foreach { r =>
        if (r._2 - b > 1800000000L) { out += ((a, b)); a = r._2; b = r._2 }
        else b = r._2
      }
      out += ((a, b)); out
    }.toSeq
    // sweep: delta map, per-day straight cumulative with carry
    val deltas = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    sessions.foreach { case (a, b) => deltas(a) += 1; deltas(b + 1) -= 1 }
    val byDay = deltas.toSeq.sortBy(_._1).groupBy(_._1 / 86400000000L)
    var carry = 0L
    val ref = byDay.keys.toSeq.sorted.map { d =>
      val bounds = byDay(d).sortBy(_._1)
      var cur = carry; var peak = carry
      bounds.foreach { case (_, dl) => cur += dl; peak = math.max(peak, cur) }
      val row = (d, bounds.length.toLong, carry, peak)
      carry = cur
      row
    }
    val got = ops.Insights.eventsPeakConcurrency(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === ref, "timeline sweep replay")
    // conservation: everything that opens closes — final carry is zero
    assert(carry === 0L)
    got.foreach { case (d, _, ci, peak) => assert(peak >= ci && peak >= 0L, s"day $d") }
  }

  test("events_theilsen_trend: brute-force pairwise-slope median replay; audit cells consistent") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val daily = io.Readers.table(spark, dir, "events")
      .select(col("event_type"), unix_date(to_date(col("ts"))).cast("long").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = ops.Insights.eventsTheilsenTrend(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    val byType = daily.groupBy(_._1)
    assert(got.map(_._1).toSet === byType.keySet)
    got.foreach { case (t, nDays, nPairs, dy, dx, slope) =>
      val ds = byType(t).sortBy(_._2)
      assert(nDays === ds.length.toLong)
      val pairs = for {
        i <- ds.indices; j <- (i + 1) until ds.length
      } yield {
        val (dyP, dxP) = (ds(j)._3 - ds(i)._3, ds(j)._2 - ds(i)._2)
        (dyP.toDouble / dxP.toDouble, dyP, dxP, ds(i)._2, ds(j)._2)
      }
      assert(nPairs === pairs.length.toLong)
      val med = pairs.sorted.apply((pairs.length + 1) / 2 - 1)
      assert((dy, dx) === ((med._2, med._3)), s"type $t median pair")
      assert(slope === med._1, s"type $t slope")
      // the exact rational and the double agree to representation
      assert(math.abs(slope - dy.toDouble / dx.toDouble) === 0.0)
    }
  }

  test("stat_mann_kendall: brute-force S + tie-variance replay; cells consistent") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val daily = io.Readers.table(spark, dir, "events")
      .select(col("event_type"), unix_date(to_date(col("ts"))).cast("long").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = ops.Insights.statMannKendall(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val byType = daily.groupBy(_._1)
    assert(got.map(_._1).toSet === byType.keySet)
    got.foreach { case (t, nDays, nPairs, sStat, tieNum, var18) =>
      val ds = byType(t).sortBy(_._2)
      val n = ds.length.toLong
      assert(nDays === n)
      assert(nPairs === n * (n - 1) / 2)
      val sExp = (for {
        i <- ds.indices; j <- (i + 1) until ds.length
      } yield java.lang.Long.signum(ds(j)._3 - ds(i)._3).toLong).sum
      assert(sStat === sExp, s"type $t S")
      val tieExp = ds.groupBy(_._3).values
        .map(g => { val tt = g.size.toLong; tt * (tt - 1) * (2 * tt + 5) }).sum
      assert(tieNum === tieExp, s"type $t ties")
      assert(var18 === n * (n - 1) * (2 * n + 5) - tieExp)
      assert(var18 >= 0 && math.abs(sStat) <= nPairs)
    }
  }

  test("orders_abc_xyz: brute-force class replay + part/revenue conservation") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val li = io.Readers.table(spark, dir, "lineitem")
      .select(col("l_partkey"),
        ((col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long") *
          (lit(100) - (col("l_discount").cast("decimal(18,2)") * 100).cast("long"))).as("e4"),
        trunc(col("l_shipdate"), "month").as("m"),
        col("l_quantity").cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDate(2).toString, r.getLong(3)))
    val rev = li.groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
    val total = rev.values.sum
    val order = rev.toSeq.sortBy { case (p, r) => (-r, p) }
    val abc = {
      var cum = 0L
      order.map { case (p, r) =>
        cum += r
        val ppm = (BigInt(cum) * 1000000 / BigInt(total)).toLong
        p -> (if (ppm <= 800000L) "A" else if (ppm <= 950000L) "B" else "C")
      }.toMap
    }
    val xyz = li.groupBy(_._1).map { case (p, g) =>
      val mq = g.groupBy(_._3).map { case (_, rows) => rows.map(_._4).sum }.toSeq
      val (n, s2, q2) = (mq.length.toLong, mq.sum, mq.map(x => x * x).sum)
      val v = n * q2 - s2 * s2
      p -> (if (4 * v <= s2 * s2) "X" else if (v <= s2 * s2) "Y" else "Z")
    }
    val want = rev.keys.groupBy(p => (abc(p), xyz(p))).map { case (k, ps) =>
      k -> (ps.size.toLong, ps.map(rev).sum) }
    val got = ops.Insights.ordersAbcXyz(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got === want)
    assert(got.values.map(_._1).sum === rev.size.toLong, "part conservation")
    assert(got.values.map(_._2).sum === total, "revenue conservation")
  }

  test("events_lifecycle_states: brute-force state-machine replay + conservation") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val presence = io.Readers.table(spark, dir, "events")
      .select(col("event_type"), col("user_id"),
        expr("CAST(unix_date(to_date(ts)) AS BIGINT) div 7").as("wk"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val maxWk = presence.map(_._3).max
    val byTU = presence.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sorted).toMap
    val counts = scala.collection.mutable.Map.empty[(String, Long, String), Long]
      .withDefaultValue(0L)
    byTU.foreach { case ((t, _), wks) =>
      wks.zipWithIndex.foreach { case (w, i) =>
        val state =
          if (i == 0) "new"
          else if (wks(i - 1) == w - 1) "retained"
          else "resurrected"
        counts((t, w, state)) += 1
        val nxt = if (i + 1 < wks.length) Some(wks(i + 1)) else None
        if (w < maxWk && nxt.forall(_ > w + 1)) counts((t, w + 1, "churned")) += 1
      }
    }
    val got = ops.Insights.eventsLifecycleStates(spark, dir).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val wantKeys = counts.keys.map(k => (k._1, k._2)).toSet
    assert(got.keySet === wantKeys)
    got.foreach { case ((t, w), (nn, nr, ns, nc)) =>
      assert(nn === counts((t, w, "new")), s"new $t/$w")
      assert(nr === counts((t, w, "retained")), s"retained $t/$w")
      assert(ns === counts((t, w, "resurrected")), s"resurrected $t/$w")
      assert(nc === counts((t, w, "churned")), s"churned $t/$w")
    }
    // conservation: Σ new over weeks = the type's distinct user count
    got.toSeq.groupBy(_._1._1).foreach { case (t, rows) =>
      assert(rows.map(_._2._1).sum === byTU.keys.count(_._1 == t).toLong, s"new-sum $t")
    }
  }

  test("stat_mutual_info_cells: JVM fixed-point replay; MI nonnegative; marginals conserve") {
    import functions.NumericExpressions.log2FixedJ
    val rows = ops.Insights.statMutualInfoCells(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val n = rows.head._6
    assert(rows.map(_._3).sum === n, "cells partition N")
    rows.foreach { case (_, _, c, r, cc, nn, term) =>
      assert(nn === n)
      assert(term === c * (log2FixedJ(c * nn) - log2FixedJ(r * cc)))
    }
    // marginal consistency: Σ over a segment's cells = its r
    rows.groupBy(_._1).foreach { case (seg, g) =>
      assert(g.map(_._3).sum === g.head._4, s"row marginal $seg")
    }
    // MI >= 0 up to fixed-point truncation (~3e-6 bits/term)
    val miBits = rows.map(_._7).sum.toDouble / (n * 1048576.0)
    assert(miBits >= -1e-4, s"MI = $miBits")
  }

  test("orders_price_elasticity: cells replay brute-force; fixed-point slope tracks libm OLS") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val got = ops.Insights.ordersPriceElasticity(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val brandOf = io.Readers.table(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = io.Readers.table(spark, dir, "lineitem")
      .select(col("l_partkey"), substring(col("l_shipdate"), 1, 7).as("month"),
        graft.Determinism.dec(col("l_quantity")).as("q"),
        graft.Determinism.dec(col("l_extendedprice")).as("p"))
      .collect()
      .map(r => (brandOf(r.getLong(0)), r.getString(1),
        r.getDecimal(2), r.getDecimal(3)))
    val cells = rows.groupBy(t => (t._1, t._2)).map { case ((b, _), g) =>
      (b, g.map(_._3.longValueExact()).sum,
        g.map(t => t._4.movePointRight(2).longValueExact()).sum)
    }.filter(t => t._2 > 0 && t._3 > 0)
    import graft.functions.NumericExpressions.log2FixedJ
    val want = cells.groupBy(_._1).flatMap { case (b, g) =>
      val xy = g.map { case (_, q, rev) =>
        ((log2FixedJ(rev) - log2FixedJ(q)) >> 10, log2FixedJ(q) >> 10)
      }.toSeq
      val n = xy.size.toLong
      val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
      val (sxy, sxx) = (xy.map(t => t._1 * t._2).sum, xy.map(t => t._1 * t._1).sum)
      val den = n * sxx - sx * sx
      if (den == 0) None else Some(b -> ((n, n * sxy - sx * sy, den)))
    }
    assert(got === want, "cells == brute-force replay")
    // semantic guard: the fixed-point slope tracks the double OLS on
    // the true logs (the >>10 quantization noise stays small)
    cells.groupBy(_._1).foreach { case (b, g) =>
      val pts = g.map { case (_, q, rev) =>
        (math.log(rev.toDouble / q), math.log(q.toDouble))
      }.toSeq
      val n = pts.size
      if (n >= 3 && got.contains(b)) {
        val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
        val (sxy, sxx) = (pts.map(t => t._1 * t._2).sum, pts.map(t => t._1 * t._1).sum)
        val den = n * sxx - sx * sx
        if (math.abs(den) > 1e-6) {
          val ref = (n * sxy - sx * sy) / den
          val (nn, num, dd) = got(b)
          val fp = num.toDouble / dd
          assert(math.abs(fp - ref) < 0.05 + 0.02 * math.abs(ref),
            s"brand $b: fp slope $fp vs libm $ref")
        }
      }
    }
  }

  test("events_shapley_attribution: driver-side power-set replay; efficiency axiom holds x24") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val ev = io.Readers.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val chs = ev.map(_._2).distinct.filter(_ != "purchase").sorted
    assert(chs.length === 4, "the x24 scale assumes 4 channels on this corpus")
    val bit = chs.zipWithIndex.toMap
    val buyTs = ev.filter(_._2 == "purchase").groupBy(_._1)
      .map { case (u, g) => u -> g.map(_._3).min }
    val maskOf = buyTs.map { case (u, bts) =>
      u -> ev.filter(e => e._1 == u && e._2 != "purchase" && e._3 < bts)
        .map(e => 1L << bit(e._2)).foldLeft(0L)(_ | _)
    }
    val mCount = maskOf.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def v(s: Long): Long = mCount.filter { case (m, _) => (m & s) == m }.values.sum
    val fact = Array(1L, 1L, 2L, 6L)
    val want = chs.map { c =>
      val b = 1L << bit(c)
      val phi = (0L until 16L).filter(s => (s & b) == 0).map { s =>
        val pop = java.lang.Long.bitCount(s)
        fact(pop) * fact(3 - pop) * (v(s + b) - v(s))
      }.sum
      c -> phi
    }.toMap
    val got = ops.Insights.eventsShapleyAttribution(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === want)
    // efficiency: Σφ·24⁻¹ = v(C) − v(∅)
    assert(got.values.sum === 24L * (v(15L) - v(0L)), "efficiency axiom")

    // ---- the SAMPLED estimator against the same game (round 13,
    // §8.r13 item 15): efficiency is EXACT for any permutation set
    // (per-permutation marginals telescope), and each channel's
    // estimate converges on the exact value
    val sampled = ops.Insights.eventsShapleySampled(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nP = sampled.head._3
    assert(sampled.map(_._4).sum === nP * (v(15L) - v(0L)),
      "sampled efficiency telescopes exactly")
    val total = (v(15L) - v(0L)).toDouble
    sampled.foreach { case (c, _, np, phiSum) =>
      val est = phiSum.toDouble / np
      val exact = want(c).toDouble / 24.0
      assert(math.abs(est - exact) <= math.max(1.0, 0.10 * total),
        s"channel $c: sampled $est vs exact $exact (total $total)")
    }
  }
}
