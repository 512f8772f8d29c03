package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage wall-clock profile of the curation composite (round 16)
  * — replays the same shared frame-level forms stage by stage with a
  * timer at each checkpoint boundary, so the 7.8 s isolated cost is
  * attributable. Run: sbt "Test/runMain graft.ScratchPipeProfile [dir]".
  */
object ScratchPipeProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    (1 to 2).foreach { rep =>
      var last = System.nanoTime()
      val t0 = last
      def mark(label: String, n: Long): Unit = {
        val now = System.nanoTime()
        println(f"rep$rep $label: ${(now - last) / 1e9}%5.2f s  (rows $n)")
        last = now
      }
      val raw = graft.io.Readers.table(spark, dir, "documents")
        .filter(trim(col("text")) =!= "")
        .select(col("doc_id"), col("lang"), col("text")).localCheckpoint()
      mark("raw", raw.count())
      val quality = raw.join(
          ops.Curation2.gopherScored(raw).filter(col("pass")).select("doc_id"),
          Seq("doc_id"), "left_semi").localCheckpoint()
      mark("quality", quality.count())
      val keepExact = quality
        .select(col("doc_id"), sha2(lower(regexp_replace(trim(col("text")), "\\s+", " ")), 256).as("h"))
        .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      val exact = quality.join(keepExact, Seq("doc_id"), "left_semi").localCheckpoint()
      mark("exact", exact.count())
      val pairs = ops.Llm2.jaccardPairsOf(exact).select(col("a_id"), col("b_id"))
        .localCheckpoint()
      mark("jaccard pairs", pairs.count())
      val dupIds = ops.Llm.connectedComponents(pairs)
        .filter(col("id") =!= col("comp")).select(col("id").as("doc_id"))
      val neardup = exact.join(dupIds, Seq("doc_id"), "left_anti").localCheckpoint()
      mark("cc + neardup", neardup.count())
      val cleaned = ops.Curation2.removeSpans(neardup)
        .filter(col("clean_text") =!= "")
        .select(col("doc_id"), col("lang"), col("clean_text").as("text"),
          col("n_spans_cut"), col("toks_removed")).localCheckpoint()
      mark("removeSpans", cleaned.count())
      // round 17: mirror the shipped stage — survivors' cleaned text
      // vs the FULL raw eval set (contaminationBetween)
      val contam = ops.Curation.contaminationBetween(
          cleaned.filter(col("doc_id") % 20 =!= 0).select(col("doc_id"), col("text")),
          raw.filter(col("doc_id") % 20 === 0).select(col("text")))
        .select("doc_id")
      val decontam = cleaned.filter(col("doc_id") % 20 =!= 0)
        .join(contam, Seq("doc_id"), "left_anti").localCheckpoint()
      mark("decontam", decontam.count())
      val mixed = ops.Llm.temperatureKeep(decontam).localCheckpoint()
      mark("temperature", mixed.count())
      val curated = mixed
        .withColumn("bucket", ops.Llm.splitBucket(col("doc_id")))
        .withColumn("split", ops.Llm.splitName(col("bucket"))).localCheckpoint()
      mark("curated", curated.count())
      val packs = ops.Llm2.packSequences(
        curated.filter(col("split") === "train").select("doc_id", "text"), 256)
      mark("packs", packs.count())
      val model = ops.Bpe.trainedStateShared(spark, dir)
        .select(col("w"), size(col("syms")).cast("long").as("n_syms"))
      val bpe = curated
        .select(col("lang"), explode(split(trim(col("text")), "\\s+")).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("cnt"))
        .join(model, "w")
        .groupBy(col("lang"))
        .agg(sum(col("cnt")).as("n_words"), sum(col("cnt") * col("n_syms")).as("n_bpe_tokens"))
      mark("bpe (incl. model build rep1)", bpe.count())
      println(f"rep$rep TOTAL: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
