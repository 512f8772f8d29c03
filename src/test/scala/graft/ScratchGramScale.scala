package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale fixture for the Gram family (round 12, fourth session): at
  * real vector counts, (a) how far does the typed-Aggregator key
  * ([[ops.Embeddings.embedGramCells]]-shape) outrun the declarative
  * struct-explode control, and (b) does [[ops.GramService]] actually
  * amortize — build once + small appends served from stored partials
  * vs re-folding the grown corpus per question?
  *
  * Synthesizes N d=64 vectors with hash-mixed components in [−1, 1]
  * (content is irrelevant to the cost model — the work is N·d(d+1)/2
  * integer multiply-adds either way), writes them as parquet so both
  * subjects pay the same scan, then times same-JVM:
  *
  *   (a) aggregator fold vs declarative explode at N;
  *   (b) service build at N, a 1 % append, serving the grown cells
  *       from partials vs re-folding the grown corpus.
  *
  * Run: `sbt "Test/runMain graft.ScratchGramScale [nVecs]"`.
  */
object ScratchGramScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val d = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "96g")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-gramscale-${System.getProperty("user.name")}")
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
        transform(sequence(lit(0), lit(d - 1)),
          i => ((pmod(xxhash64(col("id") * lit(d) + i), lit(2001L)) - lit(1000L))
            .cast("double") / lit(1000.0)).cast("float")).as("embedding"))

    val path = s"/tmp/gramscale-raw-${System.getProperty("user.name")}"
    time("write raw corpus") {
      synth(spark.range(n)).write.mode("overwrite").parquet(path)
    }
    val emb = spark.read.parquet(path)

    // (a) aggregator at full N; the declarative control at min(N, 10⁶)
    // (its per-row struct fan-out is too slow to run at 10⁷ — that IS
    // the finding; scale its number by the corpus ratio when reading)
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    def aggFold(df: org.apache.spark.sql.DataFrame): Seq[Long] = df
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * lit(ops.Embeddings.GramScale)).cast("long")).as("q"))
      .agg(udaf(new ops.Embeddings.GramAgg,
        ExpressionEncoder[Array[Long]]())(col("q")).as("b"))
      .head().getSeq[Long](0)
    val nDecl = math.min(n, 1000000L)
    val embDecl = emb.filter(col("vec_id") < nDecl)
    for (rep <- 1 to 2) {
      time(s"aggregator fold rep$rep (n=$n)") {
        val b = aggFold(emb)
        println(s"  n=${b.head} cells=${b.length - 1} g0=${b(1)}")
      }
      time(s"declarative explode rep$rep (n=$nDecl)") {
        val rows = ops.Embeddings.gramCellsDeclarative(embDecl).collect()
        println(s"  cells=${rows.length} g00=${rows.head.getLong(3)}")
      }
      time(s"aggregator fold rep$rep (n=$nDecl — same-subset control)") {
        val b = aggFold(embDecl)
        println(s"  n=${b.head} g0=${b(1)}")
      }
    }

    // (b) service economics
    time("service build") {
      ops.GramService.build(spark, "gramscale_svc", emb)
    }
    val inc = synth(spark.range(n, n + n / 100))
    time("1% append (fold increment only)") {
      ops.GramService.appendVecs(inc, "gramscale_svc")
    }
    time("serve grown cells from partials") {
      val r = ops.GramService.cellsOver(spark, "gramscale_svc").collect()
      println(s"  served cells=${r.length} n_vecs=${r.head.getLong(2)}")
    }
    time("re-fold grown corpus via aggregator (the honest rescan alternative)") {
      val b = aggFold(emb.unionByName(inc))
      println(s"  n=${b.head} g0=${b(1)}")
    }
    graft.io.TableManifest.drop(spark, "gramscale_svc")
    spark.stop()
  }
}
