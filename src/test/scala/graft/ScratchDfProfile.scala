package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: the df-profile numbers behind the adaptive PPJoin
  * switch in [[ops.Curation.dedupNgramContainment]] — prints
  * Σdf (gram rows), Σdf² (pair-join volume), and their ratio for the
  * real documents corpora and the two ScratchPrefixFilter fixtures.
  * The ratio Σdf²/Σdf is the expected pair rows PER GRAM ROW of the
  * shared-count join; the measured A/B flip (BASELINE.md r6:
  * shared-count wins uniform, loses 4–7× on Zipf) picks the
  * threshold between the corpora's ratios.
  * Run: sbt "Test/runMain graft.ScratchDfProfile".
  */
object ScratchDfProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def profile(name: String, inv: DataFrame): Unit = {
      val r = inv.groupBy(col("gh")).agg(count(lit(1)).as("df"))
        .agg(sum(col("df")).as("n"),
          sum(col("df") * col("df")).cast("double").as("sumdf2"),
          max(col("df")).as("maxdf"))
        .head()
      val ratio = r.getDouble(1) / r.getLong(0)
      println(f"$name%-22s gramRows=${r.getLong(0)}%9d  sumDf2=${r.getDouble(1)}%14.0f  maxDf=${r.getLong(2)}%6d  ratio=$ratio%8.1f")
    }

    for (sf <- Seq("sf0.01", "sf0.1")) {
      val grams = graft.functions.TextExpressions.wordShingles(col("text"), 2)
      val inv = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .select(col("doc_id"), col("lang"), grams.as("grams"))
        .filter(size(col("grams")) > 0)
        .select(col("doc_id"), explode(col("grams")).as("gram"), col("lang"))
        .select(xxhash64(col("lang"), col("gram")).as("gh"))
      profile(s"documents $sf", inv)
    }

    def zipfTok(u: Double, vocab: Int): Int =
      math.min(vocab - 1, math.floor(math.exp(u * math.log(vocab))).toInt)
    for (zipf <- Seq(false, true)) {
      val docs = (0 until 8000).map { d =>
        val base = (0 until 40).map { i =>
          val u = (d * 41L + i * 7L) % 1000 / 1000.0
          if (zipf) s"t${zipfTok(u, 30000)}" else s"t${(d * 37L + i * 13L) % 3000}"
        }
        (d.toLong, base.sliding(2).map(_.mkString(" ")).toSeq.distinct)
      }
      val inv = docs.toDF("doc_id", "grams")
        .select(col("doc_id"), explode(col("grams")).as("gram"))
        .select(xxhash64(col("gram")).as("gh"))
      profile(if (zipf) "fixture zipf" else "fixture uniform", inv)
    }
    spark.stop()
  }
}
