package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: Σdf² (the shared-count join's pair-row volume) of the
  * token-bigram inverted index per corpus — the dispatch measurement
  * behind [[ops.PairJoins.BandedPairVolume]] (round 15). Prints the
  * probe's two inputs (Σdf, maxDf) and the predicted pair volume for
  * each dir passed (defaults to the three testdata SFs + /tmp/sf03 +
  * /tmp/sf1 where present).
  * Run: sbt "Test/runMain graft.ScratchPairVolume [dirs...]".
  */
object ScratchPairVolume {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
        "/tmp/sf03", "/tmp/sf1").filter(d => new java.io.File(d).isDirectory)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { dir =>
      val dfreq = ops.PairJoins.bigramDfreq(spark, dir)
      val r = dfreq.agg(sum(col("df")).as("n"), max(col("df")).as("maxdf"))
        .head()
      val vol = ops.PairJoins.pairVolume(dfreq)
      println(f"$dir%-24s sumDf=${r.getLong(0)}%10d maxDf=${r.getLong(1)}%7d " +
        f"pairVolume=$vol%14.3e banded=${vol > ops.PairJoins.BandedPairVolume}")
    }
    spark.stop()
  }
}
