package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: VocabService vs per-query corpus re-tokenization at 10⁷
  * docs (pattern of ScratchCardinalityScale / ScratchBm25Corpus).
  * Synthetic documents: 5 langs (hash mod), quadratic-Zipf vocabulary
  * over 2·10⁵ candidate types, 20–60 tokens/doc. Subjects:
  *
  *  1. the batch path — every coverage/zipf/top-k/term-count question
  *     re-tokenizes the whole corpus ([[InfoTheory.vocabCounts]] is
  *     the front of each);
  *  2. [[ops.VocabService]]: one-time build (the same tokenize, paid
  *     once), then every question served from the stored vocabulary
  *     relation (types, not instances) — plus the append flow: fold
  *     a 1 % increment and re-serve, vs re-tokenizing everything.
  *
  * Run: `sbt "Test/runMain graft.ScratchVocabScale [nDocs]"`.
  */
object ScratchVocabScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.driver.memory", "96g")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("vocab-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nDocs = args.headOption.map(_.toLong).getOrElse(10000000L)
    val vocab = 200000L

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // ---- corpus: quadratic-Zipf text, 20-60 tokens/doc, 5 langs ----
    val corpusPath = s"/tmp/vocabcorpus_$nDocs"
    if (!new java.io.File(corpusPath).exists()) {
      timed("corpus write") {
        spark.range(0, nDocs, 1, 64)
          .select(col("id").as("doc_id"),
            concat(lit("l"), pmod(xxhash64(col("id")), lit(5L)).cast("string"))
              .as("lang"),
            concat_ws(" ", transform(
              sequence(lit(1), (pmod(xxhash64(col("id")), lit(41L)) + 20).cast("int")),
              j => concat(lit("t"),
                ((pmod(xxhash64(col("id"), j), lit(vocab)) *
                  pmod(xxhash64(col("id"), j), lit(vocab)))
                  .divide(lit(vocab))).cast("long").cast("string"))))
              .as("text"))
          .write.mode("overwrite").parquet(corpusPath)
      }
    }
    val all = spark.read.parquet(corpusPath)
    val main9 = all.filter(col("doc_id") % 100 =!= 0)  // 99 %
    val inc1 = all.filter(col("doc_id") % 100 === 0)   //  1 % increment
    println(s"corpus: ${all.count()} docs")

    // ---- subject 1: batch path, per-question corpus re-tokenize ----
    (1 to 2).foreach { i =>
      timed(s"batch coverage (full re-tokenize), rep$i") {
        ops.InfoTheory.coverageFromCounts(
          ops.InfoTheory.vocabCounts(main9)).collect()
      }
    }
    timed("batch zipf (full re-tokenize)") {
      ops.InfoTheory.zipfFromCounts(
        ops.InfoTheory.vocabCounts(main9)).collect()
    }
    timed("batch term counts (full re-tokenize)") {
      ops.InfoTheory.vocabCounts(main9)
        .filter(col("tok").isin("t0", "t17", "t19999")).collect()
    }

    // ---- subject 2: service — tokenize once, serve from types ------
    timed("VocabService build (one-time)") {
      ops.VocabService.build(spark, "vocabscale", main9, buckets = 32)
    }
    (1 to 2).foreach { i =>
      timed(s"served coverage, rep$i") {
        ops.VocabService.coverageOver(spark, "vocabscale").collect()
      }
    }
    timed("served zipf") {
      ops.VocabService.zipfOver(spark, "vocabscale").collect()
    }
    timed("served top-20") {
      ops.VocabService.topkOver(spark, "vocabscale", 20).collect()
    }
    (1 to 2).foreach { i =>
      timed(s"served term counts (bucket-pruned), rep$i") {
        ops.VocabService.termCounts(spark, "vocabscale",
          Seq("t0", "t17", "t19999")).collect()
      }
    }

    // ---- the append flow: 1 % increment ----------------------------
    timed("append 1% increment (tokenizes the increment only)") {
      ops.VocabService.appendDocs(inc1, "vocabscale")
    }
    timed("served coverage after append") {
      ops.VocabService.coverageOver(spark, "vocabscale").collect()
    }
    timed("batch coverage over grown corpus (the alternative: re-tokenize 100%)") {
      ops.InfoTheory.coverageFromCounts(
        ops.InfoTheory.vocabCounts(all)).collect()
    }

    // equality spot-check at scale
    val a = ops.VocabService.coverageOver(spark, "vocabscale")
      .collect().map(_.toSeq).toSeq
    val b = ops.InfoTheory.coverageFromCounts(ops.InfoTheory.vocabCounts(all))
      .orderBy("lang", "k").collect().map(_.toSeq).toSeq
    println(s"servedCoverage==batchCoverage: ${a == b}")

    io.TableManifest.drop(spark, "vocabscale")
    spark.stop()
  }
}
