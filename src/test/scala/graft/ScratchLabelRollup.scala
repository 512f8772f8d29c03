package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** §8.r12 item-1 second half: quantify the rollup-vs-closure cost
  * collapse at sf0.1. The three closure keys (`sim_profile_clusters`,
  * `dedup_cluster_histogram`, `sample_cluster_inverse`) each recompute
  * the deletion-signature closure in-suite; a deployment that
  * maintains the label table continuously (ClusterMaintenance) pays
  * only the two tiny rollups (`histogramOver` / `inverseSampleOver`)
  * over the committed labels. This runner times both paths on the
  * same VM, same JVM:
  *
  *   (a) each self-contained key end-to-end (closure recompute);
  *   (b) bootstrapLabels once (the amortized cost), then the two
  *       consumers over loadLabels.
  *
  * Run: `sbt "Test/runMain graft.ScratchLabelRollup [sfDir]"`.
  */
object ScratchLabelRollup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "96g")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-rollup-${System.getProperty("user.name")}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // JIT/page-cache warm pass at sf0.001 (the bench protocol's dry-run)
    ops.Bipartite.dedupClusterHistogram(spark, "/root/testdata/sf0.001").collect()
    ops.Bipartite.sampleClusterInverse(spark, "/root/testdata/sf0.001").collect()

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      time("self dedup_cluster_histogram") {
        ops.Bipartite.dedupClusterHistogram(spark, dir).collect().length
      }
      time("self sample_cluster_inverse") {
        ops.Bipartite.sampleClusterInverse(spark, dir).collect().length
      }
      time("self sim_profile_clusters") {
        ops.Bipartite.simProfileClusters(spark, dir).collect().length
      }
    }

    val labels = ops.Bipartite.simProfileClusters(spark, dir)
      .select(col("custkey").as("id"), col("cluster_id").as("comp"))
    spark.sql("DROP TABLE IF EXISTS rollup_labels__v0")
    time("bootstrapLabels (amortized, once per corpus)") {
      ops.ClusterMaintenance.bootstrapLabels(labels, "rollup_labels")
    }
    val profiled = ops.Bipartite.ordersBrandProfile(spark, dir)
      .select(col("custkey").as("id")).localCheckpoint()
    for (rep <- 1 to 2) {
      println(s"--- rollup rep $rep ---")
      val loaded = ops.ClusterMaintenance.loadLabels(spark, "rollup_labels")
      val h = time("rollup histogramOver") {
        ops.Bipartite.histogramOver(loaded, profiled).collect()
      }
      val i = time("rollup inverseSampleOver") {
        ops.Bipartite.inverseSampleOver(loaded).collect()
      }
      println(s"rows hist=${h.length} inv=${i.length}")
    }
    spark.sql("DROP TABLE IF EXISTS rollup_labels__v0")
    spark.stop()
  }
}
