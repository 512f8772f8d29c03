package graft

import org.apache.spark.sql.SparkSession

/** One-off executed-plan dump for the round-8 keys (plan audit). */
object ScratchExplainR8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val keys = Seq("events_pattern_match", "win_streak_islands",
      "text_ngram_novelty", "graph_k_core", "graph_jaccard_neighbors",
      "graph_label_propagation")
    keys.foreach { k =>
      println(s"\n================ $k ================")
      println(SparkEntry.queries(k)(spark, dir).queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
