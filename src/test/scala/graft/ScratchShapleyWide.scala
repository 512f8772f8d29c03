package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The sampled Shapley estimator in the regime it exists for: a
  * 16-channel corpus, where the exact power-set method needs 2¹⁶ =
  * 65,536 subset states and 16! weights (the documented ~20-channel
  * wall), while the sampled form stays P·|C| lattice rows. Checks in
  * numbers: runtime at P ∈ {64, 240, 960}, the EXACT efficiency
  * telescoping invariant at every P, and estimator convergence
  * (the planted structure: channels ch00/ch01 appear in every
  * converting user's touchset, the rest are noise — their φ must
  * dominate).
  *
  * Run: `sbt "Test/runMain graft.ScratchShapleyWide [nUsers]"`.
  */
object ScratchShapleyWide {
  def main(args: Array[String]): Unit = {
    val nUsers = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // synthetic journeys: every user touches ch00 or ch01 (the
    // drivers), plus 2 hash-drawn noise channels of 14, then buys
    val events = spark.range(nUsers).flatMap { u =>
      val driver = if (u % 2 == 0) "ch00" else "ch01"
      val n1 = s"ch${(math.abs(u * 2654435761L) % 14 + 2)}".formatted("%s")
      val n2 = s"ch${(math.abs(u * 40503L + 7) % 14 + 2)}"
      Seq((u, driver, 1000L), (u, n1, 2000L), (u, n2, 3000L),
        (u, "purchase", 4000L))
    }.toDF("user_id", "event_type", "off")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00"))
        + make_dt_interval(lit(0), lit(0), lit(0), col("off") / 1000.0))
      .select("user_id", "event_type", "ts")
      .localCheckpoint()
    println(s"[shapleywide] ${events.count()} events, " +
      events.select("event_type").distinct().count() + " types")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[shapleywide] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (p <- Seq(64, 240, 960)) {
      val rows = time(s"sampled shapley P=$p over 16 channels") {
        ops.Insights.shapleySampledOver(events, nPerms = p).collect()
      }
      val phiSum = rows.map(_.getLong(3)).sum
      // efficiency telescopes EXACTLY: every converting user's mask is
      // contained in the full set, none in the empty set
      require(phiSum == p.toLong * nUsers,
        s"P=$p: efficiency ${phiSum} != ${p.toLong * nUsers}")
      val byCh = rows.map(r => r.getString(0) -> r.getLong(3).toDouble / p).toMap
      val drivers = (byCh("ch00") + byCh("ch01"))
      val noise = byCh.filterKeys(k => k != "ch00" && k != "ch01").values.sum
      println(f"[shapleywide] P=$p: driver phi share ${drivers / (drivers + noise)}%.3f " +
        f"(ch00=${byCh("ch00")}%.0f ch01=${byCh("ch01")}%.0f)")
    }
    spark.stop()
  }
}
