package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage breakdown of dedup_ngram_containment at sf0.1.
  * Run: sbt "Test/runMain graft.ScratchContain".
  */
object ScratchContain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit =
      (1 to 2).foreach { i =>
        System.gc()
        val t0 = System.nanoTime()
        val n = f
        println(f"$label rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    // full operator
    time("full containment") {
      ops.Curation.dedupNgramContainment(spark, dir).count()
    }
    // pair-generation + count + integer prefilter only (no verify joins)
    val grams = graft.functions.TextExpressions.wordShingles(col("text"), 2)
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), grams.as("grams"))
      .filter(size(col("grams")) > 0)
      .select(col("doc_id"), col("lang"), size(col("grams")).as("gsz"), col("grams"))
    val inv = d
      .select(col("doc_id"), col("gsz"), col("lang"), explode(col("grams")).as("gram"))
      .select(col("doc_id"), col("gsz"), xxhash64(col("lang"), col("gram")).as("gh"))
    val a = inv.select(col("gh"), col("doc_id").as("a_id"), col("gsz").as("a_sz"))
    val b = inv.select(col("gh").as("b_gh"), col("doc_id").as("b_id"),
      col("gsz").as("b_sz")).hint("shuffle_hash")
    time("pair join + prefilter only") {
      a.join(b, col("gh") === col("b_gh") && col("a_id") < col("b_id"))
        .select(shiftleft(col("a_id").cast("long"), 32)
          .bitwiseOR(col("b_id").cast("long")).as("pk"), col("a_sz"), col("b_sz"))
        .groupBy(col("pk"))
        .agg(count(lit(1)).as("shared_h"),
          max(col("a_sz")).as("a_sz"), max(col("b_sz")).as("b_sz"))
        .filter(lit(5) * col("shared_h") >= lit(4) * least(col("a_sz"), col("b_sz")))
        .count()
    }
    // shingle computation alone
    time("shingles scan only") { d.agg(count(lit(1))).count() }
    spark.stop()
  }
}
