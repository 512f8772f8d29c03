package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch: the quantile-family scale fixture (SURVEY §8 / r7 verdict
  * item 6). ScratchRfm pinned the rfm shape at 4M users; this harness
  * runs the [[graft.ops.Analytics.balancedBuckets]]-based exact
  * quantile VECTOR (the `agg_quantiles_bucketed` shape, inlined the
  * way ScratchRfm inlines its subject) over ~10⁸ generated rows —
  * large enough that a straggler task or an unbounded window input
  * is visible in wall time — and reports, besides wall time:
  *
  *   - per-task max records (SparkListener over task metrics, worst
  *     three stages) — the "no task exceeds the bounded per-bucket
  *     promise" check, measured on the EXECUTED job rather than
  *     inferred from the plan;
  *   - per-(group,bucket) row counts for the lognormal groups
  *     (balance: ≤3× the ideal n/16) and per-bucket DISTINCT-value
  *     counts for all groups (the window-input bound that holds even
  *     for the 30 % point-mass group, whose tied value collapses to
  *     one row before the in-bucket window).
  *
  * The population plants both documented adversaries: a lognormal
  * heavy tail (Box–Muller over hash-uniforms) in three groups and a
  * 30 % point mass in the fourth. Run:
  * `sbt "Test/runMain graft.ScratchQuantileScale [nRows]"`.
  */
object ScratchQuantileScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.driver.memory", "96g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = args.headOption.map(_.toLong).getOrElse(100000000L)
    val nB = 16

    // per-stage max task records (input or shuffle-read, whichever fed
    // the task); stages registered before the timed reps only
    val stageMax = new ConcurrentHashMap[Int, AtomicLong]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val recs = math.max(m.inputMetrics.recordsRead,
            m.shuffleReadMetrics.recordsRead)
          stageMax.computeIfAbsent(te.stageId, _ => new AtomicLong(0))
            .getAndUpdate(prev => math.max(prev, recs))
        }
      }
    })

    def u(salt: String) =
      (pmod(xxhash64(col("id"), lit(salt)), lit(1000000L)).cast("double") + 1.0) / 1000001.0
    // groups g0..g2: lognormal exp(N(0,1)); g3: 30 % point mass at
    // exactly 42.42, lognormal otherwise
    val lognorm = exp(sqrt(lit(-2.0) *
      org.apache.spark.sql.functions.log(u("u1"))) * cos(lit(2.0 * math.Pi) * u("u2")))
    val base = spark.range(n).select(
        concat(lit("g"), pmod(xxhash64(col("id"), lit("g")), lit(4L))).as("g"),
        when(pmod(xxhash64(col("id"), lit("g")), lit(4L)) === 3 &&
             pmod(xxhash64(col("id"), lit("pm")), lit(10L)) < 3, lit(42.42))
          .otherwise(lognorm).as("v"))
      .localCheckpoint()
    println(s"rows: ${base.count()}")

    // the agg_quantiles_bucketed shape over (g, v) — see
    // ops/Analytics.scala aggQuantilesBucketed for the annotated form
    def quantiles(t0: DataFrame): DataFrame = {
      val qs = Seq(25, 50, 75, 90)
      val t = ops.Analytics.balancedBuckets(t0, "g", "v", nB)
      val parts = t.groupBy(col("g"), col("bucket")).agg(count(lit(1)).as("bn"))
      val wRun = Window.partitionBy(col("g")).orderBy(col("bucket"))
      val wTot = Window.partitionBy(col("g"))
      val ranked = parts
        .withColumn("cumb", sum(col("bn")).over(wRun))
        .withColumn("tot", sum(col("bn")).over(wTot))
      val wQ = Window.partitionBy(col("g"), col("q")).orderBy(col("bucket"))
      val pivots = ranked
        .select(col("g"), col("bucket"), col("bn"), col("cumb"), col("tot"),
          explode(array(qs.map(lit): _*)).as("q"))
        .filter(col("cumb") * 100 >= col("q") * col("tot"))
        .withColumn("rn", row_number().over(wQ))
        .filter(col("rn") === 1)
        .select(col("g"), col("q"), col("bucket").as("pbucket"),
          (col("cumb") - col("bn")).as("off"), col("tot"))
      val wIn = Window.partitionBy(col("g"), col("q")).orderBy(col("v"))
      t.join(broadcast(pivots), Seq("g"))
        .filter(col("bucket") === col("pbucket"))
        .groupBy(col("g"), col("q"), col("off"), col("tot"), col("v"))
        .agg(count(lit(1)).as("vn"))
        .withColumn("cum", col("off") + sum(col("vn")).over(wIn))
        .filter(col("cum") * 100 >= col("q") * col("tot"))
        .groupBy(col("g"), col("q"))
        .agg(min(col("v")).as("quantile_val"))
        .orderBy("g", "q")
    }

    (1 to 2).foreach { rep =>
      System.gc()
      stageMax.clear()
      val t0 = System.nanoTime()
      val out = quantiles(base).collect()
      println(f"quantile vector rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (rep == 2) {
        out.foreach(r => println(f"  ${r.getString(0)} p${r.getInt(1)}%d = ${r.getDouble(2)}%.4f"))
        val worst = stageMax.entrySet().toArray(Array.empty[java.util.Map.Entry[Int, AtomicLong]])
          .map(e => (e.getKey, e.getValue.get())).sortBy(-_._2).take(3)
        worst.foreach { case (sid, mx) => println(s"  stage $sid max task records: $mx") }
        // two legitimate per-task maxima: the checkpoint map slice
        // (~n/32) and a window reducer that hash-bundles several of
        // the 16 (g,q) units (each ~n/64 pivot-bucket rows; 5 of 16
        // on one of 32 reducers observed at 2M). Cap at the larger of
        // 1.25× the map slice and 8× the bucket unit — a global
        // per-group window (the failure mode this guards) would read
        // a whole group, n/4 = 16× the unit, and trip it
        val cap = math.max(n / 32 * 5 / 4, 8 * (n / 64))
        assert(worst.head._2 <= cap,
          s"straggler: a task consumed ${worst.head._2} records (cap $cap)")
      }
    }

    // bucket balance on the executed assignment (one extra pass)
    val t = ops.Analytics.balancedBuckets(base, "g", "v", nB)
    val perBucket = t.groupBy(col("g"), col("bucket"))
      .agg(count(lit(1)).as("bn"), count_distinct(col("v")).as("dv"))
      .localCheckpoint()
    val ideal = n / 4.0 / nB
    val maxLog = perBucket.filter(col("g") =!= "g3").agg(max(col("bn"))).head().getLong(0)
    val maxDv = perBucket.agg(max(col("dv"))).head().getLong(0)
    val maxPm = perBucket.filter(col("g") === "g3").agg(max(col("bn"))).head().getLong(0)
    println(f"ideal rows/bucket: $ideal%.0f; lognormal max bucket: $maxLog " +
      f"(${maxLog / ideal}%.2fx); point-mass-group max bucket: $maxPm " +
      f"(${maxPm / ideal}%.2fx — the tied value, ONE distinct row to the window); " +
      f"max DISTINCT values/bucket: $maxDv (${maxDv / ideal}%.2fx)")
    assert(maxLog <= 3 * ideal, "lognormal groups must stay count-balanced")
    assert(maxDv <= 3 * ideal, "window input (distinct values) must stay bounded in EVERY group")
    spark.stop()
  }
}
