package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** §8.r11.2 measurement: incremental cluster maintenance vs
  * from-scratch re-clustering. Corpus = the ScratchProfileScale
  * generator at n profiles (duplicate groups + Δ=1 variants); batch =
  * a fresh m-profile arrival (same structure, disjoint id space,
  * ~half the batch near-duplicating existing templates). Times:
  *
  *   (a) bootstrap: pairs + CC over the n-profile corpus
  *   (b) incremental: ProfileIndex probe + batch-internal pairs +
  *       touched-restricted CC relabel (ClusterMaintenance.ingest)
  *   (c) from-scratch on the union (the cost (b) replaces)
  *
  * Run: `sbt "Test/runMain graft.ScratchClusterInc [n] [m]"`.
  */
object ScratchClusterInc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "96g")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-inc-${System.getProperty("user.name")}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val m = args.drop(1).headOption.map(_.toLong).getOrElse(1000L)
    val nTemplates = math.max(1L, n / 5)

    // same generator shape as ScratchProfileScale; `offset` shifts the
    // id space, `tSeed` reuses (near-dups existing templates) or shifts
    // (novel templates) the template space
    def gen(from: Long, count: Long, tSeed: Long) = {
      val tid = pmod(xxhash64(col("id"), lit(7)), lit(nTemplates)) + lit(tSeed)
      val sz = lit(21) + pmod(xxhash64(col("t"), lit(999)), lit(10)).cast("int")
      val base = sort_array(array_distinct(transform(
        sequence(lit(0), col("sz") - 1),
        i => concat(lit("b"), pmod(xxhash64(col("t"), i), lit(1000))))))
      val isVariant = pmod(xxhash64(col("id"), lit(11)), lit(50)) === 0
      spark.range(from, from + count, 1, 32)
        .select(col("id"), tid.as("t"))
        .withColumn("sz", sz)
        .withColumn("base", base)
        .select(col("id").as("c"),
          when(isVariant,
            filter(col("base"),
              (_, j) => j =!= pmod(xxhash64(col("c"), lit(13)), size(col("base")))))
            .otherwise(col("base")).as("brands"))
    }

    val corpus = gen(0, n, 0).localCheckpoint()
    // half the batch lands on existing templates, half on novel ones
    val batch = gen(n, m / 2, 0).unionAll(gen(n + m / 2, m - m / 2, nTemplates))
      .localCheckpoint()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    ops.ProfileIndex.buildIndex(corpus, "pidx_inc", buckets = 32)
    try {
      val labels = time(s"bootstrap CC n=$n") {
        val l = ops.Llm.connectedComponents(
          ops.Bipartite.deletionPairsCollapsed(corpus, 19, 20, 1)
            .select("a_id", "b_id")).localCheckpoint()
        println(s"  labeled nodes=${l.count()}")
        l
      }
      val upd = time(s"incremental ingest m=$m") {
        val u = ops.ClusterMaintenance.ingest(spark, labels, batch, corpus,
          "pidx_inc", 19, 20)
        println(s"  labeled nodes=${u.count()}")
        u
      }
      val scratch = time(s"from-scratch CC n+m") {
        val l = ops.Llm.connectedComponents(
          ops.Bipartite.deletionPairsCollapsed(corpus.unionAll(batch), 19, 20, 1)
            .select("a_id", "b_id")).localCheckpoint()
        println(s"  labeled nodes=${l.count()}")
        l
      }
      val diff = upd.exceptAll(scratch).count() + scratch.exceptAll(upd).count()
      println(s"label diff rows = $diff (must be 0)")
      assert(diff == 0)
    } finally graft.io.TableManifest.drop(spark, "pidx_inc")
    spark.stop()
  }
}
