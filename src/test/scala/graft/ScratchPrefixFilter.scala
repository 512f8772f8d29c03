package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch: containment-join A/B — the shipped shared-count algorithm
  * (count every gram collision, integer prefilter, exact verify) vs a
  * PPJoin-style prefix filter (index only each doc's rarest
  * ⌊0.2·gsz⌋+1 grams; a qualifying pair must collide inside the
  * smaller doc's prefix) — on (a) a uniform-df corpus like the real
  * one and (b) a planted heavy-tail (Zipf) vocabulary where hot-gram
  * df² is the dominant cost. Run:
  * sbt "Test/runMain graft.ScratchPrefixFilter".
  */
object ScratchPrefixFilter {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- fixtures: (doc_id, distinct-gram array) ------------------
    // heavy tail: token ranks drawn ~Zipf over a 30k vocab; a planted
    // 10% of docs are near-copies (shifted suffix) so true pairs exist
    def zipfTok(u: Double, vocab: Int): Int =
      math.min(vocab - 1, math.floor(math.exp(u * math.log(vocab))).toInt)
    def mkDocs(nDocs: Int, zipf: Boolean): DataFrame = {
      val rnd = new scala.util.Random(42)
      val docs = (0 until nDocs).map { d =>
        val base =
          if (d % 10 == 1) (0 until 40).map { i =>
            val u = ((d - 1) * 41L + i * 7L) % 1000 / 1000.0
            if (zipf) s"t${zipfTok(u, 30000)}" else s"t${((d - 1) * 37L + i * 13L) % 3000}"
          }
          else (0 until 40).map { i =>
            val u = (d * 41L + i * 7L) % 1000 / 1000.0
            if (zipf) s"t${zipfTok(u, 30000)}" else s"t${(d * 37L + i * 13L) % 3000}"
          }
        val toks = if (d % 10 == 1) base.take(36) ++ Seq("x1", s"x$d") else base
        (d.toLong, toks.sliding(2).map(_.mkString(" ")).toSeq.distinct)
      }
      rnd.shuffle(docs).toDF("doc_id", "grams")
        .filter(size(col("grams")) > 0)
        .select(col("doc_id"), size(col("grams")).as("gsz"), col("grams"))
        .localCheckpoint()
    }

    // ---- algorithm A: shipped shared-count shape ------------------
    def sharedCount(d: DataFrame): Set[(Long, Long)] = {
      val inv = d.select(col("doc_id"), explode(col("grams")).as("gram"))
        .select(col("doc_id"), xxhash64(col("gram")).as("gh"))
      val a = inv.select(col("gh"), col("doc_id").as("a_id"))
      val b = inv.select(col("gh").as("b_gh"), col("doc_id").as("b_id"))
        .hint("shuffle_hash")
      val sizes = d.select(col("doc_id"), col("gsz"))
      val cand = a.join(b, col("gh") === col("b_gh") && col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("sh"))
        .join(broadcast(sizes.select(col("doc_id").as("a_id"), col("gsz").as("asz"))), "a_id")
        .join(broadcast(sizes.select(col("doc_id").as("b_id"), col("gsz").as("bsz"))), "b_id")
        .filter(lit(5) * col("sh") >= lit(4) * least(col("asz"), col("bsz")))
      verify(cand.select("a_id", "b_id"), d)
    }

    // ---- algorithm B: prefix filter -------------------------------
    def prefixFilter(d: DataFrame): Set[(Long, Long)] = {
      val inv = d.select(col("doc_id"), col("gsz"), explode(col("grams")).as("gram"))
      val dfreq = inv.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      val ranked = inv.join(dfreq, "gram")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("gram"))))
      val prefix = ranked.filter(col("rn") <= floor(col("gsz") / 5) + 1)
        .select(col("gram"), col("doc_id").as("p_id"))
      val full = inv.select(col("gram"), col("doc_id").as("f_id"))
      val cand = prefix.join(full.hint("shuffle_hash"), "gram")
        .filter(col("p_id") =!= col("f_id"))
        .select(least(col("p_id"), col("f_id")).as("a_id"),
          greatest(col("p_id"), col("f_id")).as("b_id"))
        .distinct()
      verify(cand, d)
    }

    def verify(cand: DataFrame, d: DataFrame): Set[(Long, Long)] =
      cand
        .join(d.select(col("doc_id").as("a_id"), col("grams").as("ag"),
          col("gsz").as("asz")), "a_id")
        .join(d.select(col("doc_id").as("b_id"), col("grams").as("bg"),
          col("gsz").as("bsz")), "b_id")
        .filter(lit(5) * size(array_intersect(col("ag"), col("bg"))) >=
          lit(4) * least(col("asz"), col("bsz")))
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    def time(label: String)(f: => Set[(Long, Long)]): Set[(Long, Long)] = {
      var out: Set[(Long, Long)] = Set.empty
      (1 to 2).foreach { i =>
        System.gc()
        val t0 = System.nanoTime()
        out = f
        println(f"$label rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (${out.size} pairs)")
      }
      out
    }

    for ((name, zipf) <- Seq(("uniform", false), ("zipf-heavy-tail", true))) {
      println(s"== corpus: $name ==")
      val d = mkDocs(8000, zipf)
      val hot = d.select(explode(col("grams")).as(("g"))).groupBy("g").count()
        .agg(max("count"), count(lit(1))).collect().head
      println(s"max df: ${hot.getLong(0)}, distinct grams: ${hot.getLong(1)}")
      val a = time(s"$name shared-count ")(sharedCount(d))
      val b = time(s"$name prefix-filter")(prefixFilter(d))
      assert(a == b, s"pair sets differ on $name: ${a.diff(b).take(3)} / ${b.diff(a).take(3)}")
      println("pair sets agree")
    }
    spark.stop()
  }
}
