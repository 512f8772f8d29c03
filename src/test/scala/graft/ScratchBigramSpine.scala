package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §8.r16 item 6 measured in round 15: the shared bigram relation
  * ([[ops.InfoTheory.tokBigrams]]) is built with a per-doc lead()
  * window (sort within doc). The alternative is a (doc_id, pos+1)
  * self-join of the spine against itself — no sort, one shuffle-hash
  * join on (doc_id, pos). Same rows by construction (positions are
  * dense posexplode indices over the SAME filtered spine... they are
  * NOT: the spine drops empty tokens AFTER posexplode, so positions
  * can have holes where the raw split produced "" — adjacency in the
  * FILTERED sequence is what lead() gives and what a pos+1 join
  * would get wrong on any doc with holes). The join form therefore
  * re-derives a dense rank first (another window) or joins on raw
  * pos+1 and diverges. This scratch measures BOTH and CHECKS
  * equality, so the decision is recorded either way.
  * Run: sbt "Test/runMain graft.ScratchBigramSpine [dirs...]".
  */
object ScratchBigramSpine {

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def spine(dir: String): DataFrame = {
      val tokens = split(
        lower(regexp_replace(trim(col("text")), "\\s+", " ")), " ")
      graft.io.Readers.table(spark, dir, "documents")
        .select(col("doc_id"), col("lang"),
          posexplode(tokens).as(Seq("pos", "tok")))
        .filter(col("tok") =!= "")
        .localCheckpoint()
    }

    def time(label: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[$label] rows=$n%d  ${(System.nanoTime() - t0) / 1e9}%.2f s")
      n
    }

    dirs.foreach { dir =>
      println(s"== corpus $dir")
      val sp = spine(dir)
      sp.count() // materialize outside the timed region
      import org.apache.spark.sql.expressions.Window
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val leadForm = sp.withColumn("nxt", lead(col("tok"), 1).over(wDoc))
        .filter(col("nxt").isNotNull)
        .select(col("doc_id"), col("lang"), col("tok"), col("nxt"))
      val joinForm = sp.as("a").join(
          sp.select(col("doc_id").as("d2"), (col("pos") - 1).as("p2"),
            col("tok").as("nxt")).hint("shuffle_hash"),
          col("a.doc_id") === col("d2") && col("a.pos") === col("p2"))
        .select(col("a.doc_id").as("doc_id"), col("a.lang").as("lang"),
          col("a.tok").as("tok"), col("nxt"))
      (1 to 2).foreach { rep =>
        time(s"lead rep$rep") { leadForm.groupBy(col("tok"), col("nxt")).count().count() }
        time(s"join rep$rep") { joinForm.groupBy(col("tok"), col("nxt")).count().count() }
      }
      // equality on the multiset (counts per 4-tuple)
      val lc = leadForm.groupBy(col("doc_id"), col("tok"), col("nxt"))
        .agg(count(lit(1)).as("c"))
      val jc = joinForm.groupBy(col("doc_id"), col("tok"), col("nxt"))
        .agg(count(lit(1)).as("c"))
      val diff = lc.join(jc, Seq("doc_id", "tok", "nxt", "c"), "full_outer")
        .filter(col("c").isNull).count() +
        lc.except(jc).count() + jc.except(lc).count()
      println(s"[equality] diff rows = $diff (0 = identical; nonzero = position holes exist and the join form is WRONG here)")
    }
    spark.stop()
  }
}
