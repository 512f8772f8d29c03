package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the jaccard pair-generation forms and isolate the agg cost. */
object ScratchJaccard {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_orderkey"))
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

    def time(label: String)(f: => Long): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$label rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }

    println(s"edges=${und.count()}, adj=${adj.count()}")

    // join generation WITHOUT the agg
    time("join-gen only") {
      adj.select(col("node").as("a"), col("nbr"))
        .join(adj.select(col("node").as("b"), col("nbr")), Seq("nbr"))
        .filter(col("a") < col("b"))
        .count()
    }
    // join generation + (a,b) count agg
    time("join-gen + agg") {
      adj.select(col("node").as("a"), col("nbr"))
        .join(adj.select(col("node").as("b"), col("nbr")), Seq("nbr"))
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("c"))
        .count()
    }
    // composite single-long pair key: halves hash entry weight
    time("join-gen + agg (long key)") {
      adj.select(col("node").as("a"), col("nbr"))
        .join(adj.select(col("node").as("b"), col("nbr")), Seq("nbr"))
        .filter(col("a") < col("b"))
        .select((shiftleft(col("a"), 32) + col("b")).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("c"))
        .count()
    }
    // pre-partial the pairs by middle node locally? no — test raw shuffle
    // of un-agg'd pairs into a sort-agg-ish two-step
    time("join-gen + repartition-then-agg (long key)") {
      adj.select(col("node").as("a"), col("nbr"))
        .join(adj.select(col("node").as("b"), col("nbr")), Seq("nbr"))
        .filter(col("a") < col("b"))
        .select((shiftleft(col("a"), 32) + col("b")).as("pk"))
        .repartition(col("pk"))
        .groupBy("pk").agg(count(lit(1)).as("c"))
        .count()
    }
    // edge-constrained (SCAN structural similarity): broadcast-probe
    // the wedge stream against the edge set BEFORE any aggregation
    time("edge-constrained full") {
      val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
      adj.select(col("node").as("a"), col("nbr"))
        .join(adj.select(col("node").as("b"), col("nbr")), Seq("nbr"))
        .filter(col("a") < col("b"))
        .join(broadcast(und.select(col("u").as("a"), col("v").as("b"))),
          Seq("a", "b"))
        .groupBy("a", "b").agg(count(lit(1)).as("common"))
        .join(broadcast(deg.select(col("node").as("a"), col("deg").as("deg_a"))), Seq("a"))
        .join(broadcast(deg.select(col("node").as("b"), col("deg").as("deg_b"))), Seq("b"))
        .withColumn("jaccard", col("common").cast("double") /
          (col("deg_a") + col("deg_b") - col("common")))
        .orderBy(col("jaccard").desc, col("a"), col("b")).limit(20)
        .count()
    }
    // full key shape incl. degree attach + top-20
    time("full (join form)") {
      val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
      adj.select(col("node").as("a"), col("nbr"))
        .join(adj.select(col("node").as("b"), col("nbr")), Seq("nbr"))
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("common"))
        .join(broadcast(deg.select(col("node").as("a"), col("deg").as("deg_a"))), Seq("a"))
        .join(broadcast(deg.select(col("node").as("b"), col("deg").as("deg_b"))), Seq("b"))
        .withColumn("jaccard", col("common").cast("double") /
          (col("deg_a") + col("deg_b") - col("common")))
        .orderBy(col("jaccard").desc, col("a"), col("b")).limit(20)
        .count()
    }
    spark.stop()
  }
}
