package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: BM25 retrieval at 10⁷-document scale (§8.r12.3, pattern
  * of ScratchEntropyScale). A synthetic corpus — 1,000-term Zipf-ish
  * vocabulary (quadratic hash skew: low ranks hot), 20–60 tokens/doc
  * — written to parquet once; then:
  *
  *  1. the row-local full-scan path ([[InfoTheory.bm25RowLocal]]) —
  *     what an ad-hoc query costs WITHOUT an index (two pruned scans,
  *     zero shuffles);
  *  2. [[ops.PostingIndex]]: one-time build cost, then ad-hoc probes
  *     — bucket-pruned posting reads, cost O(Σ postings(t)).
  *
  * Per-task maxima from the task-metrics listener on both.
  *
  * Run: `sbt "Test/runMain graft.ScratchBm25Corpus [nDocs]"`.
  */
object ScratchBm25Corpus {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.driver.memory", "96g")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("bm25-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nDocs = args.headOption.map(_.toLong).getOrElse(10000000L)
    val buildOnly = args.contains("buildonly")
    val shardOnly = args.contains("shardonly") // subject 3 alone (re-measure)
    val vocab = 1000L

    val stageMax = new ConcurrentHashMap[Int, AtomicLong]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val recs = math.max(m.inputMetrics.recordsRead,
            m.shuffleReadMetrics.recordsRead)
          stageMax.computeIfAbsent(te.stageId, _ => new AtomicLong(0))
            .getAndUpdate(prev => math.max(prev, recs))
        }
      }
    })
    def report(label: String): Unit = {
      val worst = stageMax.entrySet().toArray
        .map(_.asInstanceOf[java.util.Map.Entry[Int, AtomicLong]])
        .map(e => (e.getKey, e.getValue.get())).sortBy(-_._2).take(3)
      println(s"$label worst-stage per-task max records: " +
        worst.map { case (s, r) => s"stage$s=$r" }.mkString(", "))
      stageMax.clear()
    }
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      report(label)
      r
    }

    // ---- corpus: Zipf-ish text, 20-60 tokens/doc -------------------
    val corpusPath = s"/tmp/bm25corpus_$nDocs"
    if (!new java.io.File(corpusPath).exists()) {
      timed("corpus write") {
        spark.range(0, nDocs, 1, 64)
          .select(col("id").as("doc_id"),
            concat_ws(" ", transform(
              sequence(lit(1), (pmod(xxhash64(col("id")), lit(41L)) + 20).cast("int")),
              j => concat(lit("t"),
                ((pmod(xxhash64(col("id"), j), lit(vocab)) *
                  pmod(xxhash64(col("id"), j), lit(vocab)))
                  .divide(lit(vocab))).cast("long").cast("string"))))
              .as("text"))
          .write.mode("overwrite").parquet(corpusPath)
      }
    }
    val docs = spark.read.parquet(corpusPath)
    println(s"corpus: ${docs.count()} docs")

    val hotTerms = Seq("t0", "t3", "t7", "t12")      // low rank = hot
    val rareTerms = Seq("t900", "t950", "t990")       // quadratic tail

    // ---- subject 1: ad-hoc WITHOUT an index (full scan per query) --
    if (!buildOnly && !shardOnly) {
      (1 to 2).foreach { i =>
        timed(s"row-local full-scan, hot terms, rep$i") {
          ops.InfoTheory.bm25RowLocal(docs, hotTerms).collect()
        }
      }
      timed("row-local full-scan, rare terms") {
        ops.InfoTheory.bm25RowLocal(docs, rareTerms).collect()
      }
    }

    // ---- subject 2: index once, probe cheaply ----------------------
    if (!shardOnly) {
      timed("PostingIndex build (one-time)") {
        ops.PostingIndex.buildIndex(docs, "bm25scale", buckets = 32)
      }
      (1 to 2).foreach { i =>
        timed(s"index probe, hot terms, rep$i") {
          ops.PostingIndex.bm25Topk(spark, "bm25scale", hotTerms).collect()
        }
      }
      (1 to 2).foreach { i =>
        timed(s"index probe, rare terms, rep$i") {
          ops.PostingIndex.bm25Topk(spark, "bm25scale", rareTerms).collect()
        }
      }

      // equality spot-check at scale: probe == row-local on rare terms
      val a = ops.PostingIndex.bm25Topk(spark, "bm25scale", rareTerms).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSeq
      val b = ops.InfoTheory.bm25RowLocal(docs, rareTerms).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSeq
      println(s"probe==rowLocal: ${a == b}")
    }

    // ---- subject 3: doc-SHARDED index — the hot-term fix (r12) -----
    // shards=32 spreads any term's posting list over ≤32 of 64
    // buckets; a rare term reads ≤32 bucket VALUES but its rows are
    // few either way — the asymmetric trade the hot path needs.
    timed("PostingIndex SHARDED build (one-time, buckets=64 shards=32)") {
      ops.PostingIndex.buildIndex(docs, "bm25shard", buckets = 64, shards = 32)
    }
    (1 to 2).foreach { i =>
      timed(s"SHARDED probe, hot terms, rep$i") {
        ops.PostingIndex.bm25Topk(spark, "bm25shard", hotTerms).collect()
      }
    }
    (1 to 2).foreach { i =>
      timed(s"SHARDED probe, rare terms, rep$i") {
        ops.PostingIndex.bm25Topk(spark, "bm25shard", rareTerms).collect()
      }
    }
    val as = ops.PostingIndex.bm25Topk(spark, "bm25shard", hotTerms).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    val bs = ops.InfoTheory.bm25RowLocal(docs, hotTerms).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    println(s"sharded probe==rowLocal (hot): ${as == bs}")

    // ---- subject 4: Dirichlet-LM probes over the SAME sharded index
    // (§8.r13.11) — the probe front end is shared with BM25, so the
    // expectation is matching economics; the LM-specific extra is the
    // per-term cf rollup over the probed postings (bounded by hits).
    (1 to 2).foreach { i =>
      timed(s"row-local LM full-scan, hot terms, rep$i") {
        ops.InfoTheory.lmDirichletRowLocal(docs, hotTerms).collect()
      }
    }
    timed("row-local LM full-scan, rare terms") {
      ops.InfoTheory.lmDirichletRowLocal(docs, rareTerms).collect()
    }
    (1 to 2).foreach { i =>
      timed(s"SHARDED LM probe, hot terms, rep$i") {
        ops.PostingIndex.lmTopk(spark, "bm25shard", hotTerms).collect()
      }
    }
    (1 to 2).foreach { i =>
      timed(s"SHARDED LM probe, rare terms, rep$i") {
        ops.PostingIndex.lmTopk(spark, "bm25shard", rareTerms).collect()
      }
    }
    val al = ops.PostingIndex.lmTopk(spark, "bm25shard", hotTerms).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    val bl = ops.InfoTheory.lmDirichletRowLocal(docs, hotTerms).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    println(s"sharded LM probe==rowLocal (hot): ${al == bl}")
    spark.stop()
  }
}
