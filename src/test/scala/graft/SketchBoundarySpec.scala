package graft

import org.apache.spark.sql.functions._

/** ops.SketchVariants: the KLL-boundary forms of orders_pareto_share
  * and stat_winsorize agree with the exact keys within the sketch's
  * self-certified rank error, exactly as their scaladocs promise —
  * certificate asserted against exactly-computed ranks, lossless-k
  * behavior asserted as equality with the order statistics.
  */
class SketchBoundarySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val deciles = (1 to 9).map(_ / 10.0)

  /** The boundary certificates for a group's sketch at quantiles qs,
    * against EXACT ranks computed from `df`. For each q:
    * b = sketch.quantile(q), t = max(1, ⌈q·n⌉), and the KLL contract
    * is  rank_<(b) ≤ t − 1 + errBound  and  rank_≤(b) ≥ t − errBound
    * (true weight strictly below b cannot overshoot the target by
    * more than the certificate, and weight at-or-below cannot
    * undershoot it). Test scope (round 15): the exact ranks need a
    * full per-group collect — a spec's privilege, not a library
    * operator's.
    */
  private def boundaryCertificates(df: org.apache.spark.sql.DataFrame,
      groupCol: String, valueCol: String,
      sketches: Map[String, ops.Udx.KllBuf], qs: Seq[Double])
      : Seq[(String, Double, Boolean)] =
    sketches.toSeq.flatMap { case (g, sk) =>
      val vals = df.filter(col(groupCol) === g)
        .select(col(valueCol).cast("double")).collect().map(_.getDouble(0))
      qs.map { q =>
        val b = sk.quantile(q)
        val t = math.max(1L, math.ceil(q * sk.n).toLong)
        val rankLt = vals.count(_ < b).toLong
        val rankLe = vals.count(_ <= b).toLong
        val ok = rankLt <= t - 1 + sk.errBound && rankLe >= t - sk.errBound
        (g, q, ok)
      }
    }

  test("boundary certificates hold at compacting k (errBound > 0 exercised)") {
    val k = 64
    val revSk = ops.SketchVariants.revenueSketches(spark, dir, k)
    val balSk = ops.SketchVariants.balanceSketches(spark, dir, k)
    // small-k sketches over ~300-value groups must actually compact,
    // or this test exercises nothing
    assert(revSk.values.exists(_.errBound > 0) || balSk.values.exists(_.errBound > 0))
    val rev = ops.SketchVariants.customerRevenue(spark, dir)
    val bal = ops.SketchVariants.customerBalance(spark, dir)
    val certs =
      boundaryCertificates(rev, "segment", "rev_cents", revSk, deciles) ++
      boundaryCertificates(bal, "segment", "bal_cents", balSk, Seq(0.05, 0.95))
    val bad = certs.filterNot(_._3)
    assert(bad.isEmpty, s"certificate violated at: $bad")
  }

  test("lossless k: errBound 0 and boundaries ARE the order statistics") {
    val k = 4096 // >= every segment's size at sf0.01 -> no compaction
    val revSk = ops.SketchVariants.revenueSketches(spark, dir, k)
    assert(revSk.values.forall(_.errBound === 0L))
    val rev = ops.SketchVariants.customerRevenue(spark, dir)
    revSk.foreach { case (seg, sk) =>
      val sorted = rev.filter(col("segment") === seg)
        .select(col("rev_cents")).collect().map(_.getLong(0)).sorted
      assert(sk.n === sorted.length.toLong)
      deciles.foreach { q =>
        val t = math.max(1L, math.ceil(q * sk.n).toLong).toInt
        assert(sk.quantile(q).toLong === sorted(t - 1), s"seg=$seg q=$q")
      }
    }
  }

  test("paretoShareSketch: partitions the population, ppm rollup exact, near-exact at lossless k") {
    val sketch = ops.SketchVariants.paretoShareSketch(spark, dir, 4096)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val exact = ops.Insights.ordersParetoShare(spark, dir)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // the deviation surface at errBound = 0 is convention-delta (<= 1
    // rank per cut) + value ties on a cut; bound = 2 * (1 + maxTie)
    val rev = ops.SketchVariants.customerRevenue(spark, dir)
    val maxTie = rev.groupBy(col("segment"), col("rev_cents"))
      .agg(count(lit(1)).as("c")).agg(max(col("c"))).head().getLong(0)
    val slack = 2 * (1 + maxTie)
    val segs = exact.keys.map(_._1).toSet
    segs.foreach { seg =>
      val sTot = (1L to 10L).flatMap(d => sketch.get((seg, d))).map(_._1).sum
      val eTot = (1L to 10L).flatMap(d => exact.get((seg, d))).map(_._1).sum
      assert(sTot === eTot, s"population not partitioned in $seg")
      (1L to 10L).foreach { d =>
        val sc = sketch.get((seg, d)).map(_._1).getOrElse(0L)
        val ec = exact.get((seg, d)).map(_._1).getOrElse(0L)
        assert(math.abs(sc - ec) <= slack, s"seg=$seg d=$d sketch=$sc exact=$ec")
      }
      // final cumulative share is exactly 10^6 in both (total div total)
      val last = (1L to 10L).reverse.flatMap(d => sketch.get((seg, d))).head
      assert(last._3 === 1000000L)
    }
  }

  test("winsorizeSketch: lossless-k bounds within one rank step of the exact key's") {
    val sketch = ops.SketchVariants.winsorizeSketch(spark, dir, 4096)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val exact = ops.Stats.statWinsorize(spark, dir)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val bal = ops.SketchVariants.customerBalance(spark, dir)
    exact.foreach { case (seg, (n, exLo, exHi, exMean)) =>
      val (sn, sLo, sHi, sMean) = sketch(seg)
      assert(sn === n)
      val sorted = bal.filter(col("segment") === seg)
        .select(col("bal_cents")).collect().map(_.getLong(0)).sorted
      // nearest-rank conventions differ by at most one position:
      // exact key index (n-1)*p div 100 + 1 vs KLL target ceil(p*n/100)
      def within1(skV: Double, exV: Double): Boolean = {
        val i = java.util.Arrays.binarySearch(sorted, math.round(skV * 100))
        val j = java.util.Arrays.binarySearch(sorted, math.round(exV * 100))
        i >= 0 && j >= 0 && math.abs(i - j) <= 1
      }
      assert(within1(sLo, exLo), s"$seg lo: sketch=$sLo exact=$exLo")
      assert(within1(sHi, exHi), s"$seg hi: sketch=$sHi exact=$exHi")
      // and the mean moved by no more than the one-step bound-shift
      // mass: |Δmean| <= (|Δlo| * n_at_or_below + |Δhi| * n_at_or_above) / n
      val dLo = math.abs(sLo - exLo)
      val dHi = math.abs(sHi - exHi)
      assert(math.abs(sMean - exMean) <= dLo + dHi + 1e-9,
        s"$seg mean: sketch=$sMean exact=$exMean dLo=$dLo dHi=$dHi")
    }
  }

  test("ksTestSketch at lossless k: integer numerator EQUALS the exact key's d_num") {
    val exact = ops.Insights.statKsTest(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val sk = ops.SketchVariants.ksTestSketch(spark, dir, k = 4096).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(sk.keySet === exact.keySet)
    sk.foreach { case (pair, (nA, nB, dEst)) =>
      val (enA, enB, dNum) = exact(pair)
      assert(nA === enA && nB === enB, s"counts $pair")
      assert(dEst === dNum, s"lossless D must be exact at $pair")
    }
  }

  test("ksTestSketch at compacting k: normalized deviation within the heuristic slack") {
    val k = 64
    val sks = ops.SketchVariants.balanceSketches(spark, dir, k)
    assert(sks.values.exists(_.errBound > 0), "k=64 must compact on ~300-value groups")
    val exact = ops.Insights.statKsTest(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(4).toDouble / (r.getLong(2) * r.getLong(3))))
      .toMap
    val est = ops.SketchVariants.ksTestSketch(spark, dir, k).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(4).toDouble / (r.getLong(2) * r.getLong(3))))
      .toMap
    est.foreach { case (pair @ (sa, sb), dN) =>
      val slack = ops.SketchVariants.ksSlack(sks(sa), sks(sb))
      assert(math.abs(dN - exact(pair)) <= slack,
        s"$pair: est=$dN exact=${exact(pair)} slack=$slack")
    }
  }
}
