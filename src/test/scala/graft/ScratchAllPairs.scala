package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Size the all-pairs neighborhood-Jaccard space: qualifying pair
  * counts at candidate thresholds, prefix-candidate volume vs the
  * unconstrained wedge-pair volume, and end-to-end timings of the
  * prefix-filtered form (round-9 item 1).
  */
object ScratchAllPairs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      println(s"=== $dir ===")
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"))
      val und = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .withColumn("dst", lead(col("l_partkey"), 1).over(w))
        .filter(col("dst").isNotNull && col("dst") =!= col("l_partkey"))
        .select(least(col("l_partkey"), col("dst")).as("u"),
          greatest(col("l_partkey"), col("dst")).as("v"))
        .distinct()
        .localCheckpoint()
      val adj = und.select(col("u").as("node"), col("v").as("nbr"))
        .union(und.select(col("v").as("node"), col("u").as("nbr")))
        .localCheckpoint()
      val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
      println(deg.agg(min("deg"), max("deg"), avg("deg"), count(lit(1))).head())

      // inverted relation: node's "grams" are its neighbor ids
      val inv = adj.join(deg, "node")
        .select(col("node").as("doc_id"), col("deg").as("gsz"),
          col("nbr").cast("long").as("gh"))
        .localCheckpoint()
      val dfreq = inv.groupBy(col("gh")).agg(count(lit(1)).as("df"))
      println(s"hotGramShare = ${graft.ops.PairJoins.hotGramShare(dfreq)}")

      def timeIt[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }

      for ((tauName, pdiv, ratio, num, den) <-
          Seq(("1/2", 3, 2, 1, 2), ("1/3", 2, 3, 1, 3))) {
        val cand = graft.ops.PairJoins.prefixCandidates(inv, dfreq,
          prefixDivisor = pdiv, sizeRatio = Some(ratio)).localCheckpoint()
        val nCand = timeIt(s"tau=$tauName candidates")(cand.count())
        // exact verify via adjacency-array intersect
        val arrs = adj.groupBy(col("node"))
          .agg(sort_array(collect_list(col("nbr"))).as("nbrs"))
        val q = cand
          .join(arrs.select(col("node").as("a_id"), col("nbrs").as("a_n")), "a_id")
          .join(arrs.select(col("node").as("b_id"), col("nbrs").as("b_n")), "b_id")
          .withColumn("common", size(array_intersect(col("a_n"), col("b_n"))))
          .filter(lit(den) * col("common") >=
            lit(num) * (col("a_sz") + col("b_sz") - col("common")))
        val nQual = timeIt(s"tau=$tauName verify")(q.count())
        println(s"tau=$tauName: candidates=$nCand qualifying=$nQual")
      }
    }
    spark.stop()
  }
}
