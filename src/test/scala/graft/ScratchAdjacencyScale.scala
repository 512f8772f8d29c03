package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale fixture for [[ops.AdjacencyIndex]] (round 12): at real edge
  * counts, what does the persisted bucketed layout buy an iterative
  * consumer over the in-plan path (which must normalize + checkpoint
  * the edge relation before its first round)? Synthesizes a
  * power-law-ish graph of E directed edges over E/8 nodes (hub bias
  * via hash-mod exponent mixing — realistic frontier fan-out), then
  * times, same JVM:
  *
  *   (a) index build (one-time: normalize + bucket write);
  *   (b) 4-hop multi-source BFS via `bfsOver` (stored table per
  *       round) vs the in-plan path (normalize + localCheckpoint,
  *       then the same loop) — both to completion, rows asserted
  *       identical;
  *   (c) repeat BFS from DIFFERENT seed sets — the deployment shape
  *       the index exists for: the in-plan path pays normalization
  *       again per query, the index amortizes it.
  *
  * Run: `sbt "Test/runMain graft.ScratchAdjacencyScale [nEdges]"`.
  */
object ScratchAdjacencyScale {
  def main(args: Array[String]): Unit = {
    val nE = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "96g")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-adjscale-${System.getProperty("user.name")}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val nodes = nE / 8
    // hub bias: src drawn from a squared-hash distribution (low ids
    // denser), dst near-uniform — a few high-degree hubs, long tail
    val rawPath = s"/tmp/adjscale-raw-${System.getProperty("user.name")}"
    time("write raw edges") {
      spark.range(nE)
        .withColumn("h1", pmod(xxhash64(col("id"), lit(1)), lit(nodes)))
        .withColumn("h2", pmod(xxhash64(col("id"), lit(2)), lit(nodes)))
        .select(((col("h1") * col("h1")) % nodes).as("src"), col("h2").as("dst"))
        .write.mode("overwrite").parquet(rawPath)
    }
    val raw = spark.read.parquet(rawPath)

    io.TableManifest.drop(spark, "adjscale")
    time("index build (one-time)") {
      ops.AdjacencyIndex.build(spark, "adjscale", raw, buckets = 32)
    }

    def seedsMod(m: Long) = ops.AdjacencyIndex.edges(spark, "adjscale")
      .select(col("src").as("node")).distinct().filter(col("node") % m === 0)

    for ((m, rep) <- Seq((9973L, 1), (9973L, 2), (7919L, 1), (6397L, 1))) {
      val got = time(s"bfsOver mod$m rep$rep (index)") {
        ops.AdjacencyIndex.bfsOver(spark, "adjscale", seedsMod(m), 4).count()
      }
      val ref = time(s"in-plan mod$m rep$rep (normalize+checkpoint+loop)") {
        val e = raw.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
          .filter(col("src") =!= col("dst"))
        val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
          .distinct().localCheckpoint()
        val seeds = und.select(col("src").as("node")).distinct()
          .filter(col("node") % m === 0)
        ops.Graph.bfsLayers(und, seeds, 4).count()
      }
      println(s"ROWS mod$m index=$got inplan=$ref match=${got == ref}")
    }

    io.TableManifest.drop(spark, "adjscale")
    spark.stop()
  }
}
