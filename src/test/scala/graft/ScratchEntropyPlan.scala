package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.NumericExpressions.log2Fixed

/** A/B the entropy key's shuffle count: free-planned (doc,tok) +
  * (doc) exchanges vs a forced doc_id clustering that both aggs can
  * reuse. Also dumps the executed plans of the round-9 family.
  */
object ScratchEntropyPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(label: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$label rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }

    val toks = split(lower(regexp_replace(trim(col("text")), "\\s+", " ")), " ")

    // current form: two agg exchanges
    def current = io.Readers.table(spark, dir, "documents")
      .select(col("doc_id"), explode(toks).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("cnt") * log2Fixed(col("cnt"))).as("scl"))

    // forced doc clustering: one exchange serves both aggs
    def clustered = io.Readers.table(spark, dir, "documents")
      .select(col("doc_id"), explode(toks).as("tok"))
      .filter(col("tok") =!= "")
      .repartition(col("doc_id"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("cnt") * log2Fixed(col("cnt"))).as("scl"))

    time("current (2 exchanges)")(current.count())
    time("clustered (1 exchange)")(clustered.count())
    println("=== current plan ===")
    println(current.queryExecution.executedPlan.toString.take(3000))
    println("=== clustered plan ===")
    println(clustered.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
