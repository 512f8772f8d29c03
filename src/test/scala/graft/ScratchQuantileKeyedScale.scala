package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for the round-13 KEYED QuantileService: 10⁷
  * events over 90 days × 8 event types with per-type value
  * distributions (different log-normal-ish scales per type), the
  * latency-SLO shape. Questions answered with numbers:
  *   (a) one-time build cost (per-(dim, day) sketch pass);
  *   (b) per-dim p50/p99 over day ranges served from stored sketches
  *       vs the exact percentile_approx/exact-sort rescan;
  *   (c) the 1 %-increment merge cost (open-day micro-batch path).
  *
  * Run: `sbt "Test/runMain graft.ScratchQuantileKeyedScale [nEvents]"`.
  */
object ScratchQuantileKeyedScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "96g")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-qkscale-${System.getProperty("user.name")}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[qkscale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // 8 types with distinct value scales; heavy right tails
    val raw = spark.range(n)
      .withColumn("d", pmod(xxhash64(col("id"), lit(1)), lit(90)))
      .withColumn("ts", to_timestamp(
        date_add(lit("2024-01-01").cast("date"), col("d").cast("int"))))
      .withColumn("event_type",
        concat(lit("ep"), pmod(xxhash64(col("id"), lit(2)), lit(8))))
      .withColumn("u",
        (pmod(xxhash64(col("id"), lit(3)), lit(1000000)) + 1).cast("double") / 1000000.0)
      // per-type scale × a tail-heavy transform of u
      .withColumn("value",
        (pmod(xxhash64(col("event_type")), lit(50)) + 1).cast("double") *
          (col("u") / (lit(1.001) - col("u"))))
      .select("ts", "event_type", "value")
    val path = s"/tmp/qkscale-raw-${System.getProperty("user.name")}"
    time("write raw corpus")(raw.write.mode("overwrite").parquet(path))
    val events = spark.read.parquet(path)

    io.TableManifest.drop(spark, "qkscale")
    time("keyed service build (one-time, per-(dim, day) sketch pass)") {
      ops.QuantileService.buildKeyed(spark, "qkscale", events)
    }

    for ((label, from, to) <- Seq(
        ("7d", Some("2024-02-01"), Some("2024-02-07")),
        ("30d", Some("2024-01-15"), Some("2024-02-13")),
        ("all", None: Option[String], None: Option[String]))) {
      val served = time(s"served per-dim p50/p99 over $label") {
        ops.QuantileService.quantilesByDim(spark, "qkscale",
          Seq(0.5, 0.99), from, to)
      }
      val rescan = time(s"exact-ish rescan per-dim p50/p99 over $label (percentile_approx)") {
        Seq(from.map(d => to_date(col("ts")) >= d),
            to.map(d => to_date(col("ts")) <= d))
          .flatten.foldLeft(events)(_ filter _)
          .groupBy(col("event_type"))
          .agg(percentile_approx(col("value"), array(lit(0.5), lit(0.99)),
            lit(10000)).as("p"))
          .collect()
      }
      // sanity: served estimates sit inside a loose band of the rescan
      val byDim = rescan.map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      served.foreach { case (dim, q, est, _, _) =>
        val ref = if (q == 0.5) byDim(dim)(0) else byDim(dim)(1)
        require(est > 0 && ref > 0 && est / ref < 3 && ref / est < 3,
          s"$label $dim q=$q served $est vs rescan $ref")
      }
    }

    // 1 % increment through the open-day merge path
    val inc = events.limit((n / 100).toInt)
    time("1% increment mergeDaysKeyed") {
      ops.QuantileService.mergeDaysKeyed(spark, "qkscale", inc)
    }
    time("served per-dim p50/p99 after increment (all days)") {
      ops.QuantileService.quantilesByDim(spark, "qkscale", Seq(0.5, 0.99))
    }
    io.TableManifest.drop(spark, "qkscale")
    spark.stop()
  }
}
