package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale fixture for the keyed (per-label) first-moment family
  * (round 12, fifth session — the §8.r13 item-13 measurement): at
  * real vector counts, (a) how far does the per-label
  * [[ops.Embeddings.CentroidAgg]] fold outrun the posexplode
  * declarative control (the Gram lesson transferred to the first
  * moment — explode here is d ROWS per vector, not d²/2 structs, so
  * the gap should be real but smaller), and (b) does
  * [[ops.CentroidService]] amortize — build once + small appends,
  * affinity served from stored partials vs re-folding the grown
  * corpus per question?
  *
  * Same synthetic protocol as ScratchGramScale (hash-mixed d=64
  * vectors, parquet-scanned by every subject, same JVM), plus a
  * 10-label assignment (vec_id mod 10).
  *
  * Run: `sbt "Test/runMain graft.ScratchCentroidScale [nVecs]"`.
  */
object ScratchCentroidScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val d = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "96g")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-ctrscale-${System.getProperty("user.name")}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def synth(ids: org.apache.spark.sql.Dataset[java.lang.Long]) = ids.toDF()
      .select(col("id").as("vec_id"),
        pmod(col("id"), lit(10L)).as("label"),
        transform(sequence(lit(0), lit(d - 1)),
          i => ((pmod(xxhash64(col("id") * lit(d) + i), lit(2001L)) - lit(1000L))
            .cast("double") / lit(1000.0)).cast("float")).as("embedding"))

    val path = s"/tmp/ctrscale-raw-${System.getProperty("user.name")}"
    time("write raw corpus") {
      synth(spark.range(n)).write.mode("overwrite").parquet(path)
    }
    val emb = spark.read.parquet(path)

    // (a) aggregator vs posexplode-declarative, both at full N (the
    // first-moment explode is d rows/vector — runnable at 10⁷, unlike
    // the Gram struct fan-out), plus a 10⁶-subset control pair
    val nSub = math.min(n, 1000000L)
    val embSub = emb.filter(col("vec_id") < nSub)
    for (rep <- 1 to 2) {
      time(s"aggregator centroid fold rep$rep (n=$n)") {
        val rows = ops.Embeddings.centroidCellsOf(emb).collect()
        println(s"  cells=${rows.length} n0=${rows.head.getLong(2)}")
      }
      time(s"declarative posexplode rep$rep (n=$n)") {
        val rows = ops.Embeddings.centroidCellsDeclarative(emb).collect()
        println(s"  cells=${rows.length} n0=${rows.head.getLong(2)}")
      }
      time(s"aggregator rep$rep (n=$nSub subset)") {
        ops.Embeddings.centroidCellsOf(embSub).collect()
      }
      time(s"declarative rep$rep (n=$nSub subset)") {
        ops.Embeddings.centroidCellsDeclarative(embSub).collect()
      }
    }

    // (b) service economics: affinity as the served question
    time("service build") {
      ops.CentroidService.build(spark, "ctrscale_svc", emb)
    }
    val inc = synth(spark.range(n, n + n / 100))
    time("1% append (fold increment only)") {
      ops.CentroidService.appendVecs(inc, "ctrscale_svc")
    }
    time("serve affinity matrix from partials") {
      val r = ops.CentroidService.affinityOver(spark, "ctrscale_svc").collect()
      println(s"  pairs=${r.length}")
    }
    time("re-fold grown corpus + affinity (the honest rescan alternative)") {
      val r = ops.Embeddings.affinityOfCells(
        ops.Embeddings.centroidCellsOf(emb.unionByName(inc))).collect()
      println(s"  pairs=${r.length}")
    }
    graft.io.TableManifest.drop(spark, "ctrscale_svc")
    spark.stop()
  }
}
