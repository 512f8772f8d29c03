package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: scale fixture for the deletion-signature similarity
  * family (§8.r11.1, pattern of ScratchEntropyScale) — 10⁷ planted
  * profiles with the structures the collapsed join exists for:
  *
  *  - ~2·10⁶ distinct profile templates (sorted arrays of 20–30
  *    "brands" from a 1,000-element universe), each shared by ~5
  *    customers — exact-duplicate groups, the collapse's bread and
  *    butter;
  *  - one MEGA-BLOCK of 10⁴ customers on a single template (the g²
  *    collision amplifier `deletionPairsCollapsed` neutralizes; its
  *    C(g,2) ≈ 5·10⁷ intra pairs re-expand as pure generation);
  *  - ~2 % single-deletion variants (Δ = 1 of their template, J =
  *    (sz−1)/sz ≥ 0.95 at sz ≥ 20) — the qualifying CROSS pairs the
  *    signature blocking must find.
  *
  * Subjects, each with per-task maxima from the task listener:
  *  1. `deletionPairsCollapsed(_, 19, 20, 1)` — full expanded pair
  *     count;
  *  2. the cluster closure (rep pairs + duplicate stars →
  *     `Llm.connectedComponents`) — the `sim_profile_clusters` shape.
  *
  * Run: `sbt "Test/runMain graft.ScratchProfileScale [nCust] [skipCC]"`.
  */
object ScratchProfileScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "96g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nCust = args.headOption.map(_.toLong).getOrElse(10000000L)
    val runCC = !args.drop(1).headOption.contains("skipCC")
    val nTemplates = math.max(1L, nCust / 5)
    val megaBlock = math.min(10000L, nCust / 10)

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

    def report(label: String): Unit = {
      val worst = stageMax.entrySet().toArray
        .map(_.asInstanceOf[java.util.Map.Entry[Int, AtomicLong]])
        .map(e => (e.getKey, e.getValue.get())).sortBy(-_._2).take(3)
      println(s"$label worst-stage per-task max records: " +
        worst.map { case (s, r) => s"stage$s=$r" }.mkString(", "))
      stageMax.clear()
    }

    // customer → template (mega-block pinned to template 0), base
    // profile = deterministic 21–30 draws from the universe (distinct
    // within profile), 2 % of customers drop one position (Δ=1 variant)
    val tid = when(col("id") < megaBlock, lit(0L))
      .otherwise(pmod(xxhash64(col("id"), lit(7)), lit(nTemplates)))
    val sz = lit(21) + pmod(xxhash64(col("t"), lit(999)), lit(10)).cast("int")
    val base = sort_array(array_distinct(transform(
      sequence(lit(0), col("sz") - 1),
      i => concat(lit("b"), pmod(xxhash64(col("t"), i), lit(1000))))))
    val isVariant = col("id") >= megaBlock &&
      pmod(xxhash64(col("id"), lit(11)), lit(50)) === 0
    val prof = spark.range(0, nCust, 1, 64)
      .select(col("id"), tid.as("t"))
      .withColumn("sz", sz)
      .withColumn("base", base)
      .select(col("id").as("c"),
        when(isVariant,
          filter(col("base"),
            (_, j) => j =!= pmod(xxhash64(col("c"), lit(13)), size(col("base")))))
          .otherwise(col("base")).as("brands"))

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
      report(name)
    }

    time(s"pairs collapsed n=$nCust") {
      ops.Bipartite.deletionPairsCollapsed(prof, 19, 20, 1).count()
    }

    if (runCC) time(s"clusters n=$nCust") {
      // the sim_profile_clusters composition over the same corpus
      val prof2 = prof.localCheckpoint()
      val groups = ops.Bipartite.collapseProfiles(prof2).localCheckpoint()
      val members = prof2.join(groups, "brands").select(col("c"), col("gid"))
      val repPairs = ops.Bipartite.deletionPairs(
        groups.select(col("gid").as("c"), col("brands")), 19, 20, 1)
        .select("a_id", "b_id")
      val stars = members.filter(col("c") =!= col("gid"))
        .select(col("gid").as("a_id"), col("c").as("b_id"))
      ops.Llm.connectedComponents(repPairs.unionAll(stars),
          localThreshold = 100000L)
        .select(countDistinct(col("comp"))).collect()(0).getLong(0)
    }

    spark.stop()
  }
}
