package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.Encoders

/** Aggregation and window adversarial cases: empty input, rank ties,
  * UDAF exactness vs manual decimal math, HLL error bounds.
  */
class AggWindowSpec extends SparkSpec {
  import spark.implicits._

  test("groupBy on empty input yields zero groups (not a zero row)") {
    val df = Seq.empty[(String, Double)].toDF("k", "v")
    assert(df.groupBy("k").agg(sum("v")).count() === 0)
  }

  test("global agg on empty input: count=0, sum=null") {
    val df = Seq.empty[(String, Double)].toDF("k", "v")
    val r = df.agg(count(lit(1)), sum("v")).collect().head
    assert(r.getLong(0) === 0 && r.isNullAt(1))
  }

  test("rank vs dense_rank vs row_number on ties") {
    val df = Seq(("a", 10), ("b", 10), ("c", 5)).toDF("id", "v")
    val w = Window.orderBy(col("v").desc)
    val r = df.select(col("id"), rank().over(w).as("r"), dense_rank().over(w).as("d"))
      .orderBy("id").as[(String, Int, Int)].collect()
    assert(r.toSeq === Seq(("a", 1, 1), ("b", 1, 1), ("c", 3, 2)))
  }

  test("weighted-avg UDAF equals exact decimal formula across partitioning") {
    val data = Seq(("A", 10.25, 2.0), ("A", 20.75, 3.0), ("B", 5.33, 1.0),
      ("A", 7.11, 4.0), ("B", 9.99, 7.0))
    for (parts <- Seq(1, 4)) {
      val df = spark.createDataFrame(data).toDF("k", "p", "q").repartition(parts)
      val wavg = udaf(ops.Udx.WeightedAvgPrice,
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
      val got = df.groupBy("k").agg(wavg(col("p"), col("q")).as("w"))
        .orderBy("k").as[(String, Double)].collect().toSeq
      val expect = data.groupBy(_._1).view.mapValues { rows =>
        val num = rows.map(r => BigDecimal(r._2.toString) * BigDecimal(r._3.toString)).sum
        val den = rows.map(r => BigDecimal(r._3.toString)).sum
        num.toDouble / den.toDouble
      }.toSeq.sortBy(_._1)
      assert(got === expect, s"parts=$parts")
    }
  }

  test("approx_count_distinct within declared rsd of exact") {
    val df = (1 to 5000).map(i => i % 937).toDF("v")
    val approx = df.agg(approx_count_distinct(col("v"), 0.05)).as[Long].collect().head
    assert(math.abs(approx - 937.0) / 937.0 < 0.15) // 3× rsd guard band
  }

  test("approx_percentile within sketch rank-error of exact percentile") {
    val df = (1 to 10000).map(_.toDouble).toDF("v")
    val Seq(p50, p90) = df.agg(
      percentile_approx(col("v"), lit(0.5), lit(1000)),
      percentile_approx(col("v"), lit(0.9), lit(1000)))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toList
    // accuracy=1000 bounds rank error by n/1000 = 10 ranks → |err| ≤ 10 values here
    assert(math.abs(p50 - 5000.0) <= 20.0 && math.abs(p90 - 9000.0) <= 20.0)
  }

  test("HLL sketches: estimate near exact, union of parts equals sketch of whole") {
    val df = (1 to 4000).map(i => (i % 2, i % 1501)).toDF("part", "v")
    val exact = df.select(countDistinct(col("v"))).as[Long].collect().head
    val whole = df.agg(hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))))
      .as[Long].collect().head
    assert(math.abs(whole - exact.toDouble) / exact < 0.05)
    // mergeability: union of per-part sketches ≈ sketch of the whole
    val merged = df.groupBy("part").agg(hll_sketch_agg(col("v"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true))))
      .as[Long].collect().head
    assert(merged === whole,
      "unioned per-part sketches must estimate identically to the whole-data sketch")
  }

  test("count-min: never underestimates, ε·N bound holds, partitioning-invariant (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val depth = 5; val width = 4096
    val tokExpr = split(lower(regexp_replace(trim(col("text")), "\\s+", " ")), " ")
    val tok = io.Readers.table(spark, dir, "documents")
      .filter(trim(col("text")) =!= "")
      .select(explode(tokExpr).as("tok"))
      .filter(col("tok") =!= "")
    val exact = tok.groupBy("tok").count().as[(String, Long)].collect()
    val n = exact.map(_._2).sum
    val sk = ops.Udx.cmSketch(tok, depth, width)
    // merge is an elementwise sum → the sketch is partitioning-invariant
    val sk2 = ops.Udx.cmSketch(tok.repartition(7), depth, width)
    assert(java.util.Arrays.equals(sk, sk2),
      "sketch must be identical under any partitioning")
    // one-sided: est ≥ true ALWAYS; the CM guarantee bounds the
    // overestimate at (e/width)·N per token with prob ≥ 1 − e^−depth,
    // so allow ≤ 2% of the vocabulary over the bound (≈3× e^−5)
    val bound = math.ceil(math.E / width * n).toLong
    var over = 0
    exact.foreach { case (t, c) =>
      val est = ops.Udx.cmEstimate(sk, depth, width, t)
      assert(est >= c, s"count-min underestimated '$t': $est < $c")
      if (est > c + bound) over += 1
    }
    assert(over <= math.max(1, exact.length / 50),
      s"$over of ${exact.length} tokens exceeded the ε·N bound")
    // and the registered query reports est beside exact for the top-30
    val out = ops.Udx.aggCountMin(spark, dir).collect()
    assert(out.length == 30 && out.forall(r => r.getLong(2) >= r.getLong(1)))
  }

  test("hll intersect: inclusion-exclusion estimates near exact pair overlaps (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val out = ops.Aggregations.aggHllIntersect(spark, dir).collect()
    assert(out.nonEmpty)
    val ev = io.Readers.table(spark, dir, "events")
      .select(col("event_type"), col("user_id"))
      .as[(String, Long)].collect()
    val sets = ev.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // every unordered type pair appears exactly once
    assert(out.length == sets.size * (sets.size - 1) / 2)
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val exactI = (sets(a) & sets(b)).size.toDouble
      val est = r.getLong(5).toDouble
      // lgK=12 HLL is near-exact at these cardinalities; the
      // inclusion-exclusion error is the sum of three term errors
      val tol = math.max(2.0, 0.05 * (sets(a).size + sets(b).size))
      assert(math.abs(est - exactI) <= tol,
        s"pair ($a,$b): est $est vs exact $exactI (tol $tol)")
    }
  }

  test("funnel counts are monotone and gap-fill spine is contiguous (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val f = ops.Aggregations.eventsFunnel(spark, dir).collect().head
    val (nu, ns, nc, np) = (f.getLong(0), f.getLong(1), f.getLong(2), f.getLong(3))
    assert(nu >= ns && ns >= nc && nc >= np && np >= 0,
      s"funnel must narrow monotonically: $nu >= $ns >= $nc >= $np")
    val days = ops.Aggregations.timeSeriesGapFill(spark, dir)
      .select("d").as[java.sql.Date].collect()
    val expected = (0L until days.length)
      .map(i => java.sql.Date.valueOf(days.head.toLocalDate.plusDays(i)))
    assert(days.toSeq === expected, "spine must cover every day exactly once, in order")
  }

  test("win_streak_islands equals brute-force longest consecutive-day run per user") {
    val dir = "/root/testdata/sf0.001"
    val got = ops.Windows.winStreakIslands(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate))
    val days = io.Readers.table(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().as[(Long, java.sql.Date)].collect()
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2.toLocalDate).sorted }
    val truth = days.map { case (u, ds) =>
      // walk the sorted day list accumulating runs; tie → earliest
      var bestLen = 0L; var bestStart = ds.head
      var curLen = 0L; var curStart = ds.head
      var prev: java.time.LocalDate = null
      ds.foreach { d =>
        if (prev != null && d == prev.plusDays(1)) curLen += 1
        else { curLen = 1; curStart = d }
        if (curLen > bestLen) { bestLen = curLen; bestStart = curStart }
        prev = d
      }
      (u, bestLen, bestStart)
    }.toSet
    assert(got.toSet == truth)
    assert(got.length == days.size)
    // fixture sanity: at least one real streak (>1 day) exists
    assert(got.exists(_._2 > 1))
  }

  test("running sum final row equals group total (decimal-exact)") {
    val df = Seq((1, "2024-01-01", 10.10), (1, "2024-01-02", 0.20), (1, "2024-01-03", 5.03))
      .toDF("k", "d", "v")
    val w = Window.partitionBy("k").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val last = df.select(sum(col("v").cast(Determinism.Money)).over(w).as("rs"))
      .agg(max("rs")).collect().head.getDecimal(0)
    assert(BigDecimal(last) === BigDecimal("15.33"))
  }

  test("agg_percentile_cont tracks the built-in interpolating percentile()") {
    val dir = "/root/testdata/sf0.001"
    val builtin = graft.io.Readers.table(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))").as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val got = ops.Aggregations.aggPercentileCont(spark, dir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    val pIdx = Map(500000L -> 0, 900000L -> 1, 990000L -> 2)
    got.foreach { case ((prio, ppm), micro) =>
      val ours = micro.toDouble / 1e6 / 100.0 // micro-cents -> currency
      val ref = builtin(prio)(pIdx(ppm))
      // the built-in interpolates in double; ours is exact integer —
      // they agree to float tolerance, and ours is the exact value
      assert(math.abs(ours - ref) <= 1e-6 * math.max(1.0, ref.abs),
        s"$prio p$ppm: $ours vs $ref")
    }
  }

  test("events_bounce_rate: conserves the sessionize relation exactly") {
    val dir = "/root/testdata/sf0.001"
    val sessions = ops.Windows.eventsSessionize(spark, dir).collect()
      .map(r => (r.getLong(2), r.getTimestamp(3), r.getTimestamp(4)))
    val got = ops.Windows.eventsBounceRate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._2).sum === sessions.length.toLong, "session conservation")
    assert(got.map(_._3).sum === sessions.count(_._1 == 1L).toLong, "bounce conservation")
    assert(got.map(_._4).sum === sessions.map(_._1).sum, "event conservation")
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    val durExp = sessions.filter(_._1 > 1)
      .map(s => us(s._3) - us(s._2)).sum
    assert(got.map(_._5).sum === durExp, "multi-session duration mass (micros)")
    got.foreach { case (_, ns, nb, _, _) => assert(nb <= ns) }
  }

  test("win_time_range_frame: brute-force trailing-hour replay per user") {
    val dir = "/root/testdata/sf0.001"
    val raw = graft.io.Readers.table(spark, dir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = raw.groupBy(_._2)
    val got = ops.Windows.winTimeRangeFrame(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(3), r.getLong(4)))).toMap
    assert(got.size === raw.length)
    raw.foreach { case (eid, u, us, _) =>
      val frame = byUser(u).filter(e => e._3 >= us - 3600000000L && e._3 <= us)
      assert(got(eid) === ((frame.length.toLong, frame.map(_._4).sum)),
        s"event $eid user $u")
    }
    // the frame is a single partitioned window — no self-join, no
    // unpartitioned state
    val plan = ops.Windows.winTimeRangeFrame(spark, dir)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.size === 1 && windows.head.partitionSpec.nonEmpty)
  }
}
