package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale fixture for the HyperBall reach key (§8.r13 item 14,
  * executed in round 12's fifth session): at 10⁷ edges, what does the
  * register formulation cost vs the EXACT alternative — and does the
  * "exact all-node reach is ~100× this" extrapolation hold up as a
  * MEASUREMENT rather than arithmetic?
  *
  * Protocol (same hub-biased generator as ScratchAdjacencyScale,
  * undirected-ized; same JVM):
  *   (a) HyperBall: |nodes| HLL registers, 3 union rounds, the
  *       neighborhood function N(0..3) — the shipped key's loop on
  *       the synthetic graph;
  *   (b) exact per-seed BFS (the `graph_harmonic_bounded` loop) for
  *       a SMALL seed set (256 / 1024 seeds) — measuring the
  *       per-seed cost slope directly, so the all-node cost is
  *       (measured slope)·|nodes|, a calibrated extrapolation, not a
  *       guess;
  *   (c) the exact loop's state rows vs the register count — the
  *       structural claim in numbers.
  *
  * Run: `sbt "Test/runMain graft.ScratchHyperballScale [nEdges]"`.
  */
object ScratchHyperballScale {
  def main(args: Array[String]): Unit = {
    val nE = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "96g")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-hbscale-${System.getProperty("user.name")}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val nodes = nE / 8
    val rawPath = s"/tmp/hbscale-raw-${System.getProperty("user.name")}"
    time("write raw edges") {
      spark.range(nE)
        .withColumn("h1", pmod(xxhash64(col("id"), lit(1)), lit(nodes)))
        .withColumn("h2", pmod(xxhash64(col("id"), lit(2)), lit(nodes)))
        .select(((col("h1") * col("h1")) % nodes).as("src"), col("h2").as("dst"))
        .write.mode("overwrite").parquet(rawPath)
    }
    val raw = spark.read.parquet(rawPath)
    val edges = time("undirected-ize + checkpoint") {
      val e = raw.union(raw.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
      println(s"  edges=${e.count()}")
      e
    }

    // (a) HyperBall — the shipped key's loop
    time("HyperBall 3 rounds (all nodes, lgK 12)") {
      val nds = edges.select(col("src").as("node")).distinct()
      var reg = nds.groupBy(col("node"))
        .agg(hll_sketch_agg(col("node"), lit(12)).as("reg"))
        .localCheckpoint()
      for (h <- 1 to 3) {
        val contrib = edges
          .join(reg.select(col("node").as("dst"), col("reg").as("nreg")), "dst")
          .groupBy(col("src").as("node"))
          .agg(hll_union_agg(col("nreg"), lit(false)).as("nbr"))
        reg = reg.join(contrib, Seq("node"), "left")
          .select(col("node"),
            when(col("nbr").isNull, col("reg"))
              .otherwise(hll_union(col("reg"), col("nbr"))).as("reg"))
          .localCheckpoint()
        val est = reg.agg(count(lit(1)), sum(hll_sketch_estimate(col("reg")))).head()
        println(s"  hop $h: n_nodes=${est.getLong(0)} sum_reach_est=${est.get(1)}")
      }
    }

    // (b) exact per-seed BFS at two probe densities — the cost slope
    for (mod <- Seq(4096L, 1024L)) {
      time(s"exact per-seed BFS 3 hops (seeds = node %% $mod == 0)") {
        val seeds = edges.select(col("src").as("node")).distinct()
          .filter(col("node") % mod === 0)
        println(s"  seeds=${seeds.count()}")
        var frontier = seeds.select(col("node").as("seed"), col("node"),
          lit(0L).as("hop")).localCheckpoint()
        var dist = frontier
        for (h <- 1 to 3) {
          val nbrs = frontier.select(col("seed"), col("node").as("src"))
            .join(edges, "src")
            .select(col("seed"), col("dst").as("node")).distinct()
          val fl = nbrs.join(dist, Seq("seed", "node"), "left_anti")
            .select(col("seed"), col("node"), lit(h.toLong).as("hop"))
          val fresh = if (h < 3) fl.localCheckpoint() else fl
          dist = dist.union(fresh)
          frontier = fresh
        }
        println(s"  state rows=${dist.count()}")
      }
    }
    spark.stop()
  }
}
