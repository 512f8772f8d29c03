package graft

import org.apache.spark.sql.functions._

/** ops.CardinalityService: the persisted distinct-count service —
  * per-day HLL sketches under TableManifest's atomic pointer commit,
  * appended per day, range- and rolling-queried from the sketch rows
  * alone. The core claim is LOSSLESS mergeability: a union over
  * stored per-day sketches must estimate IDENTICALLY to one sketch
  * built over the concatenated raw stream (register-wise max), so
  * these specs assert estimate EQUALITY against one-shot sketches,
  * accuracy against exact distinct counts, append/replace semantics,
  * and crash atomicity on both sides of the commit.
  */
class CardinalityServiceSpec extends SparkSpec {
  import spark.implicits._

  private class InjectedCrash extends RuntimeException("injected crash")

  private val dir = "/root/testdata/sf0.001"

  private def events = io.Readers.table(spark, dir, "events")
    .select(col("ts"), col("user_id"))

  /** One-shot estimate over a raw relation — the merge-equality
    * reference (same lgK as the service).
    */
  private def oneShot(df: org.apache.spark.sql.DataFrame): Long =
    df.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))))
      .collect()(0).getLong(0)

  test("build + serve: whole-range estimate equals one-shot, within HLL error of exact") {
    ops.CardinalityService.build(spark, "csvc_all", events)
    try {
      val (est, nRows, days) = ops.CardinalityService.distinctOver(spark, "csvc_all")
      assert(nRows === events.count(), "row conservation")
      assert(days === events.select(to_date(col("ts"))).distinct().count())
      // lossless merge: union-of-days == one sketch over everything
      assert(est === oneShot(events), "per-day union must equal the one-shot sketch")
      // and the estimate is actually accurate (lgK=12 → ~0.8 % RSE; 5σ gate)
      val exact = events.select("user_id").distinct().count()
      assert(math.abs(est - exact).toDouble / exact < 0.04,
        s"estimate $est vs exact $exact")
    } finally io.TableManifest.drop(spark, "csvc_all")
  }

  test("day-range query merges exactly the requested days") {
    ops.CardinalityService.build(spark, "csvc_rng", events)
    try {
      val days = events.select(to_date(col("ts")).cast("string").as("d"))
        .groupBy("d").count().orderBy("d").as[(String, Long)].collect()
      assert(days.length >= 3, "fixture needs multiple days")
      val (fromD, toD) = (days(1)._1, days(days.length - 2)._1)
      val (est, nRows, nDays) =
        ops.CardinalityService.distinctOver(spark, "csvc_rng", Some(fromD), Some(toD))
      val inRange = days.filter(d => d._1 >= fromD && d._1 <= toD)
      assert(nDays === inRange.length.toLong && nRows === inRange.map(_._2).sum)
      val raw = events.filter(to_date(col("ts")).cast("string").between(fromD, toD))
      assert(est === oneShot(raw), "range union must equal one-shot over the range")
    } finally io.TableManifest.drop(spark, "csvc_rng")
  }

  test("appendDays: carried days verbatim, overlap replaced, state equals full rebuild") {
    val days = events.select(to_date(col("ts")).cast("string").as("d"))
      .distinct().orderBy("d").as[String].collect()
    val cut = days(days.length / 2)
    ops.CardinalityService.build(spark, "csvc_app",
      events.filter(to_date(col("ts")).cast("string") <= cut))
    try {
      // re-ingest includes the cut day (late data) + all later days
      ops.CardinalityService.appendDays(spark, "csvc_app",
        events.filter(to_date(col("ts")).cast("string") >= cut))
      ops.CardinalityService.build(spark, "csvc_ref", events)
      try {
        val a = ops.CardinalityService.distinctOver(spark, "csvc_app")
        val b = ops.CardinalityService.distinctOver(spark, "csvc_ref")
        assert(a === b, "append path must converge to the from-scratch build")
        // per-day states identical too, not just the grand total
        for (d <- days) {
          val ra = ops.CardinalityService.distinctOver(spark, "csvc_app", Some(d), Some(d))
          val rb = ops.CardinalityService.distinctOver(spark, "csvc_ref", Some(d), Some(d))
          assert(ra === rb, s"day $d")
        }
      } finally io.TableManifest.drop(spark, "csvc_ref")
    } finally io.TableManifest.drop(spark, "csvc_app")
  }

  test("rollingDistinct: every trailing-window estimate equals one-shot over the raw window") {
    ops.CardinalityService.build(spark, "csvc_roll", events)
    try {
      val rows = ops.CardinalityService.rollingDistinct(spark, "csvc_roll", 7)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(rows.nonEmpty)
      val epoch = rows.map(_._1).map(d =>
        d -> java.time.LocalDate.parse(d).toEpochDay).toMap
      rows.foreach { case (day, inWin, est) =>
        val d1 = epoch(day)
        val winDays = rows.map(_._1).filter(d => epoch(d) > d1 - 7 && epoch(d) <= d1)
        assert(inWin === winDays.length.toLong, s"window size at $day")
        val raw = events.filter(
          unix_date(to_date(col("ts"))).cast("long").between(d1 - 6, d1))
        assert(est === oneShot(raw), s"rolling estimate at $day")
      }
    } finally io.TableManifest.drop(spark, "csvc_roll")
  }

  test("streaming ingest: open-day batches union, replayed batch is a no-op, converges to batch build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val name = "csvc_stream"
    val ckpt = java.nio.file.Files.createTempDirectory("csvc_ckpt").toString
    val stream = MemoryStream[(java.sql.Timestamp, Long)]
    val q = ops.Streaming.foreachBatchCardinality(
      stream.toDF().toDF("ts", "user_id"), name, ckpt)
    try {
      // batches 0 and 1 both feed day 1 (open-day micro-batches MERGE,
      // not replace — user 7 recurs across batches and must count once)
      stream.addData(Seq((ts("2024-03-01 10:00:00"), 7L),
        (ts("2024-03-01 11:00:00"), 8L)))
      q.processAllAvailable()
      stream.addData(Seq((ts("2024-03-01 12:00:00"), 7L),
        (ts("2024-03-02 09:00:00"), 9L)))
      q.processAllAvailable()
      assert(ops.CardinalityService.distinctOver(spark, name) === ((3L, 4L, 2L)),
        "3 distinct users over 4 rows in 2 days")
      // post-commit replay (crash before the checkpoint advanced)
      val replay = Seq((ts("2024-03-01 12:00:00"), 7L),
        (ts("2024-03-02 09:00:00"), 9L)).toDF("ts", "user_id")
      ops.Streaming.applyCardinalityBatch(name)(replay, 1L)
      assert(ops.CardinalityService.distinctOver(spark, name)._2 === 4L,
        "replayed batch must not re-count its rows")
      // streamed state == one-shot batch build over the union of batches
      val all = Seq((ts("2024-03-01 10:00:00"), 7L), (ts("2024-03-01 11:00:00"), 8L),
        (ts("2024-03-01 12:00:00"), 7L), (ts("2024-03-02 09:00:00"), 9L))
        .toDF("ts", "user_id")
      ops.CardinalityService.build(spark, "csvc_stream_ref", all)
      try {
        for (d <- Seq("2024-03-01", "2024-03-02")) {
          assert(ops.CardinalityService.distinctOver(spark, name, Some(d), Some(d))
            === ops.CardinalityService.distinctOver(spark, "csvc_stream_ref", Some(d), Some(d)),
            s"day $d")
        }
      } finally io.TableManifest.drop(spark, "csvc_stream_ref")
    } finally {
      q.stop()
      io.TableManifest.drop(spark, name)
    }
  }

  test("crash before commit leaves the old version serving; replay completes") {
    val firstHalf = events.filter(dayofmonth(col("ts")) <= 15)
    ops.CardinalityService.build(spark, "csvc_crash", firstHalf)
    try {
      val before = ops.CardinalityService.distinctOver(spark, "csvc_crash")
      intercept[InjectedCrash] {
        ops.CardinalityService.appendDays(spark, "csvc_crash", events,
          beforeCommit = () => throw new InjectedCrash)
      }
      // the pointer never moved: readers still see the pre-append state
      assert(ops.CardinalityService.distinctOver(spark, "csvc_crash") === before)
      // replay the same append to completion; crash AFTER commit must
      // also leave a fully-served new state (commit already happened)
      intercept[InjectedCrash] {
        ops.CardinalityService.appendDays(spark, "csvc_crash", events,
          afterCommit = () => throw new InjectedCrash)
      }
      ops.CardinalityService.build(spark, "csvc_crash_ref", events)
      try {
        assert(ops.CardinalityService.distinctOver(spark, "csvc_crash")
          === ops.CardinalityService.distinctOver(spark, "csvc_crash_ref"))
      } finally io.TableManifest.drop(spark, "csvc_crash_ref")
    } finally io.TableManifest.drop(spark, "csvc_crash")
  }
}
