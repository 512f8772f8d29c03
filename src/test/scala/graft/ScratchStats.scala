package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness for catalog_column_stats variants (round 6).
  * Run: sbt "Test/runMain graft.ScratchStats". Not part of the suite.
  */
object ScratchStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        System.gc()
        val t0 = System.nanoTime()
        val n = f
        println(f"$label rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    time("full columnStats") {
      ops.Stats.catalogColumnStats(spark, dir).count()
    }
    time("agg without NDVs") {
      orders.agg(count(lit(1)), count(col("o_orderkey")), min(col("o_orderkey")),
        max(col("o_orderkey")), count(col("o_totalprice")), min(col("o_totalprice")),
        max(col("o_totalprice"))).count()
    }
    time("single countDistinct x6 in one agg") {
      orders.agg(countDistinct(col("o_orderkey")), countDistinct(col("o_custkey")),
        countDistinct(col("o_orderstatus")), countDistinct(col("o_orderpriority")),
        countDistinct(col("o_totalprice")), countDistinct(col("o_orderdate"))).count()
    }
    time("union-of-columns distinct agg") {
      val parts = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority", "o_totalprice", "o_orderdate").map { c =>
        orders.select(lit(c).as("cn"), col(c).cast("string").as("v"))
      }
      parts.reduce(_ unionAll _).groupBy("cn")
        .agg(count_distinct(col("v"))).count()
    }
    spark.stop()
  }
}
