package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.NumericExpressions.log2Fixed

/** A/B for the BM25 key's plan shape (round 11): the SHIPPED
  * row-local zero-shuffle form (per-term tf via size(filter(arr)),
  * 1-row stats broadcast) vs the "natural" posting-list form
  * (explode → (doc,term) tf agg → dl window → df agg → joins), same
  * integers out. Run with SPARK_GRAFT_SF_DIR to pick the corpus.
  */
object ScratchBm25Scale {
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

    def time(label: String)(f: => Array[org.apache.spark.sql.Row]): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val r = f
        println(f"$label rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          s"(top=${r.headOption.map(_.getLong(2)).getOrElse(-1L)})")
      }

    // posting-list formulation (the round-11 first draft): one forced
    // doc exchange serving tf agg + dl window + score rollup, df agg
    // + stats as broadcast branches
    def shuffled() = {
      val qt = ops.InfoTheory.Bm25QueryTerms
      val toks = split(lower(regexp_replace(trim(col("text")), "\\s+", " ")), " ")
      val tf = graft.io.Readers.table(spark, dir, "documents")
        .select(col("doc_id"), explode(toks).as("term"))
        .filter(col("term") =!= "")
        .repartition(col("doc_id"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val tfd = tf.withColumn("dl",
        sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
      val glob = tf
        .agg(sum(col("tf")).as("total_tok"),
          countDistinct(col("doc_id")).as("n_docs"))
        .withColumn("avgdl_u", expr("total_tok * 1000000 div n_docs"))
      val q = tfd.filter(col("term").isin(qt: _*))
      val idf = q.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(glob))
        .withColumn("idf20",
          log2Fixed(lit(2) * col("n_docs") + lit(2)) -
            log2Fixed(lit(2) * col("df") + lit(1)))
        .select(col("term"), col("idf20"), col("avgdl_u"))
      q.join(broadcast(idf), "term")
        .withColumn("norm_ppm",
          expr("250000 + 750000 * (dl * 1000000000000 div avgdl_u) div 1000000"))
        .withColumn("sat_ppm",
          expr("tf * 2200000 * 1000000 div " +
            "(tf * 1000000 + 1200000 * norm_ppm div 1000000)"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hit"),
          sum(col("idf20") * col("sat_ppm")).as("bm25_u"))
        .orderBy(col("bm25_u").desc, col("doc_id"))
        .limit(10)
        .collect()
    }

    def rowLocal() =
      ops.InfoTheory.textBm25Topk(spark, dir).collect()

    // equality first: same integers from both plans
    val a = rowLocal().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val b = shuffled().map(r => (r.getLong(0), r.getLong(2))).toSeq
    println(s"identical=${a == b}")

    time("row-local (shipped)")(rowLocal())
    time("posting-shuffle")(shuffled())
    spark.stop()
  }
}
