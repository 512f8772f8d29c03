package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale fixture for [[ops.CardinalityService]] (round 12): does the
  * per-day-sketch service actually beat rescanning history for
  * distinct-count range queries at real row counts? Synthesizes a
  * corpus of N events spread over 90 days (user universe ~N/20,
  * per-day activity zipf-ish via hash mixing — every day sees a
  * different overlapping user cohort, so range distincts are NOT
  * additive and the merge semantics are actually exercised), then
  * times, same JVM:
  *
  *   (a) service build (the one-time per-day sketch pass);
  *   (b) ad-hoc range queries answered by `distinctOver` (stored
  *       sketch rows only) vs exact `countDistinct` RESCANS of the
  *       raw parquet for the same ranges (7-day, 30-day, all-time);
  *   (c) the full `rollingDistinct` 7-day curve (90 window unions)
  *       vs what the rescan path would pay for ONE window.
  *
  * Accuracy is reported next to every timing (estimate vs exact), so
  * the row records the speed-for-error trade honestly.
  *
  * Run: `sbt "Test/runMain graft.ScratchCardinalityScale [nEvents]"`.
  */
object ScratchCardinalityScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "96g")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-cardscale-${System.getProperty("user.name")}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // synthetic corpus: day d ∈ [0, 90), user drawn from a cohort
    // window sliding with the day (overlap between nearby days, drift
    // across far ones) — realistic DAU/WAU structure
    val users = n / 20
    val raw = spark.range(n)
      .withColumn("d", pmod(xxhash64(col("id"), lit(1)), lit(90)))
      .withColumn("ts", to_timestamp(
        date_add(lit("2024-01-01").cast("date"), col("d").cast("int"))))
      .withColumn("user_id",
        (col("d") * (users / 180) + pmod(xxhash64(col("id"), lit(2)), lit(users / 2))))
      .select("ts", "user_id")
    val path = s"/tmp/cardscale-raw-${System.getProperty("user.name")}"
    time("write raw corpus") {
      raw.write.mode("overwrite").parquet(path)
    }
    val events = spark.read.parquet(path)

    io.TableManifest.drop(spark, "cardscale")
    time("service build (one-time)") {
      ops.CardinalityService.build(spark, "cardscale", events)
    }

    val ranges = Seq(
      ("7d", "2024-02-01", "2024-02-07"),
      ("30d", "2024-01-15", "2024-02-13"),
      ("all", "2024-01-01", "2024-03-31"))
    for ((label, from, to) <- ranges; rep <- 1 to 2) {
      val est = time(s"service distinctOver $label rep$rep") {
        ops.CardinalityService.distinctOver(spark, "cardscale", Some(from), Some(to))._1
      }
      val exact = time(s"rescan countDistinct $label rep$rep") {
        events.filter(to_date(col("ts")).cast("string").between(from, to))
          .agg(countDistinct(col("user_id"))).collect()(0).getLong(0)
      }
      println(f"ACCURACY $label est=$est exact=$exact relerr=${
        math.abs(est - exact).toDouble / exact}%.4f")
    }

    val curve = time("rollingDistinct 7d full curve (90 windows)") {
      ops.CardinalityService.rollingDistinct(spark, "cardscale", 7).collect()
    }
    println(s"curve rows: ${curve.length}")
    val oneWin = time("rescan ONE 7d window (for comparison)") {
      events.filter(to_date(col("ts")).cast("string")
          .between("2024-02-01", "2024-02-07"))
        .agg(countDistinct(col("user_id"))).collect()(0).getLong(0)
    }
    println(s"one-window exact: $oneWin")

    io.TableManifest.drop(spark, "cardscale")
    spark.stop()
  }
}
