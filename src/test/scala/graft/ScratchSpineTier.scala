package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round 16 — the SpineRank window-vs-bucketed crossover, MEASURED
  * (the r15 verdict item 1's done-criterion row; the dispatch commit
  * referenced this measurement before the scratch existed — this file
  * closes that gap).
  *
  * Planted spine: ONE group of N distinct (group, value) rows (the
  * exact single-task sort the window branch pays) plus 4 small
  * groups, weights hashed. Both branches forced via the
  * `thresholdRows` knob of [[graft.ops.SpineRank.cumSums]]; equality
  * asserted by row-count + per-row hash checksum (order-free), then
  * steady-state wall-clocks (2 reps each).
  *
  * Run: sbt "Test/runMain graft.ScratchSpineTier [N]".
  */
object ScratchSpineTier {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // one N-row group (the straggler) + 4 small groups
    val spine = spark.range(n + 4000)
      .select(
        when(col("id") < n, lit("g_big"))
          .otherwise(concat(lit("g"), pmod(col("id"), lit(4)))).as("grp"),
        col("id").as("v"),
        pmod(xxhash64(col("id")), lit(97)).as("w0"),
        pmod(xxhash64(col("id"), lit(7)), lit(13)).as("w1"))
      .localCheckpoint()
    println(s"[spinetier] N=$n biggest-group rows=" +
      spine.groupBy("grp").count().agg(max("count")).head().getLong(0))

    def run(label: String, threshold: Long): (Long, BigDecimal) = {
      var out: (Long, BigDecimal) = (0L, BigDecimal(0))
      (1 to 2).foreach { rep =>
        System.gc()
        val t0 = System.nanoTime()
        val r = graft.ops.SpineRank.cumSums(spine, Seq("grp"), "v",
            Seq((col("w0"), "c0"), (col("w1"), "c1")), withTotals = true,
            thresholdRows = threshold)
          .agg(count(lit(1)).as("n"),
            sum(xxhash64(col("grp"), col("v"), col("c0"), col("c1"),
              col("c0_tot"), col("c1_tot")).cast("decimal(38,0)")).as("ck")).head()
        println(f"[spinetier] $label rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        out = (r.getLong(0), BigDecimal(r.getDecimal(1)))
      }
      out
    }
    val w = run("window  ", Long.MaxValue)
    val b = run("bucketed", 0L)
    println(s"[spinetier] window=(rows ${w._1}, ck ${w._2}) bucketed=(rows ${b._1}, ck ${b._2})")
    require(w == b, "branches must be row-identical")
    println("[spinetier] EQUAL")

    // topK: one N-row leaderboard group, k = 10, both branches forced
    val lead = spark.range(n)
      .select(lit("g").as("grp"), col("id").as("uid"),
        pmod(xxhash64(col("id")), lit(1000000000L)).as("score"))
      .localCheckpoint()
    def runTop(label: String, threshold: Long): Set[(Long, Long, Int)] = {
      var out: Set[(Long, Long, Int)] = Set.empty
      (1 to 2).foreach { rep =>
        System.gc()
        val t0 = System.nanoTime()
        out = graft.ops.SpineRank.topK(lead, Seq("grp"),
            Seq(col("score").desc, col("uid")), 10, saltCol = col("uid"),
            thresholdRows = threshold)
          .select(col("uid"), col("score"), col("rk").cast("int"))
          .as[(Long, Long, Int)].collect().toSet
        println(f"[spinetier] topK $label rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      out
    }
    val tw = runTop("window", Long.MaxValue)
    val ts = runTop("salted", 0L)
    require(tw == ts && tw.size == 10, "topK branches must be row-identical")
    println("[spinetier] topK EQUAL")
    spark.stop()
  }
}
