package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round 18, second session — exchange A/B for the bounded-harmonic
  * BFS (the suite's top non-composite key once hyperball shipped its
  * broadcast form): per round the loop joins frontier→edges; the
  * shipped form shuffles the 904 k-row edge relation to meet the
  * ≤100 k-row frontier EVERY round. Form B broadcasts the frontier
  * side instead — edges stream in place from their checkpoint, the
  * per-round edge exchange disappears; the (seed, node) distinct and
  * the anti-join against the settled set are unchanged (their
  * exchanges carry the BFS state itself, which is the operator's
  * intrinsic volume).
  *
  * Outputs must be IDENTICAL (exact integer BFS — no sketch
  * tolerance here).
  *
  * Run: sbt "Test/runMain graft.ScratchHarmonicForms [sfDir] [reps]".
  */
object ScratchHarmonicForms {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-harm").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edges = ops.Graph.undirectedBothEdges(spark, dir)

    // delegate to the SHIPPED loop (r18 ADVICE: re-implementing the
    // body here let future Graph changes silently diverge from what
    // this harness measures — the factored harmonicLoop exists
    // precisely so the A/B exercises the production rounds)
    def loop(bcastFrontier: Boolean): DataFrame =
      ops.Graph.harmonicLoop(edges,
        if (bcastFrontier) Long.MaxValue else 0L)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val a = loop(bcastFrontier = false).collect().toSeq
    val b = loop(bcastFrontier = true).collect().toSeq
    require(a == b, s"forms diverged: exact BFS must be identical")
    println(s"parity ok over ${a.size} seeds")

    for (r <- 1 to reps) {
      time(s"shuffle rep$r")(loop(bcastFrontier = false).count())
      time(s"bcast   rep$r")(loop(bcastFrontier = true).count())
    }
    spark.stop()
  }
}
