package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: triangle counting on a planted hub-skewed graph — the A/B
  * that motivates the degree-ordered "forward" algorithm (Schank &
  * Wagner). graph_triangle_count ships the simple id-ordering because
  * the part graph's degrees are near-uniform (measured 2.05 vs 2.66 s
  * at sf0.1); THIS fixture plants hubs so the asymptotics flip.
  * Run: sbt "Test/runMain graft.ScratchTriangleSkew".
  */
object ScratchTriangleSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // planted skew: 4 hubs each adjacent to ~HUB_DEG distinct nodes,
    // plus uniform background edges. Hub wedge count ~ 4·HUB_DEG²
    // dominates Σ deg² for the id-ordered closure; degree ordering
    // caps every node's out-degree near √(2m).
    val nNodes = 40000L
    val hubDeg = 8000
    val nBackground = 150000
    // hubs sit at MIDDLE ids: an id-ordered closure centers a wedge at
    // v when u < v < w, so a middle-id hub contributes ~(deg/2)^2
    // wedges — the pathological shape. (A first fixture with hub ids
    // 0-3 accidentally neutralized the skew: a minimum-id hub is never
    // a wedge center under id-ordering.)
    val hubBase = nNodes / 2
    val hubs = (0 until 4).flatMap { h =>
      (0 until hubDeg).map { i =>
        val other = ((i * 37L + h * 11L) % nNodes)
        (hubBase + h, other)
      }
    }
    val bg = (0 until nBackground).map { i =>
      val a = (i * 101L) % nNodes
      val b = (i * 197L + 13L) % nNodes
      (a, b)
    }
    val und = (hubs ++ bg).filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("u", "v").distinct().localCheckpoint()
    println(s"edges: ${und.count()}")

    def simple(): Long = {
      val wedges = und.join(und.select(col("u").as("v2"), col("v").as("w")),
          col("v") === col("v2"))
        .select(col("u"), col("v"), col("w"))
      wedges.join(und.select(col("u").as("u3"), col("v").as("w3")),
          col("u") === col("u3") && col("w") === col("w3"))
        .count()
    }

    def degreeOrdered(): Long = {
      val deg = und.select(col("u").as("n")).unionAll(und.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
        .select(col("n"), (col("d") * 4294967296L + col("n")).as("okey"))
      val oriented = und
        .join(deg.select(col("n").as("u"), col("okey").as("ku")), "u")
        .join(deg.select(col("n").as("v"), col("okey").as("kv")), "v")
        .select(
          when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("src"),
          when(col("ku") < col("kv"), col("v")).otherwise(col("u")).as("dst"),
          greatest(col("ku"), col("kv")).as("kdst"))
        .localCheckpoint()
      val wedges = oriented
        .join(oriented.select(col("src").as("s2"), col("dst").as("w"),
          col("kdst").as("kw")), col("src") === col("s2"))
        .filter(col("kdst") < col("kw"))
        .select(col("src").as("x"), col("dst").as("v"), col("w"))
      wedges.join(oriented.select(col("src").as("v"), col("dst").as("w")),
          Seq("v", "w"))
        .count()
    }

    def time(label: String)(f: => Long): Long = {
      var last = 0L
      (1 to 2).foreach { i =>
        System.gc()
        val t0 = System.nanoTime()
        last = f
        println(f"$label rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($last triangles)")
      }
      last
    }
    val a = time("id-ordered   ")(simple())
    val b = time("degree-ordered")(degreeOrdered())
    assert(a == b, s"triangle counts differ: $a vs $b")
    println("counts agree")
    spark.stop()
  }
}
