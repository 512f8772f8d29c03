package graft

import org.apache.spark.sql.functions._

/** ops.PostingIndex: persisted inverted index + ad-hoc BM25 probe —
  * probe equals the row-local reference bit-for-bit on arbitrary term
  * sets, the shipped key's output reproduces through the index, bucket
  * pruning reaches the probed scan, and append+compact preserve the
  * corpus view.
  */
class PostingIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = io.Readers.table(spark, dir, "documents")

  private def asTuples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

  test("probe == row-local reference on the shipped terms AND ad-hoc sets (bit-exact)") {
    ops.PostingIndex.buildIndex(docs, "postidx_a")
    try {
      // the shipped key's exact output reproduces through the index
      val viaKey = asTuples(ops.InfoTheory.textBm25Topk(spark, dir))
      val viaIdx = asTuples(ops.PostingIndex.bm25Topk(
        spark, "postidx_a", ops.InfoTheory.Bm25QueryTerms))
      assert(viaIdx === viaKey)
      // ad-hoc sets the index has never seen as literals
      for (terms <- Seq(Seq("data", "query"), Seq("customer"),
          Seq("merge", "sort", "join", "hash", "scan"))) {
        val ref = asTuples(ops.InfoTheory.bm25RowLocal(docs, terms))
        val got = asTuples(ops.PostingIndex.bm25Topk(spark, "postidx_a", terms))
        assert(got === ref, s"terms=$terms")
      }
      // a term absent from the corpus contributes nothing, present ones still score
      val ref = asTuples(ops.InfoTheory.bm25RowLocal(docs, Seq("data", "zzz_absent")))
      val got = asTuples(ops.PostingIndex.bm25Topk(spark, "postidx_a",
        Seq("data", "zzz_absent")))
      assert(got === ref)
    } finally io.TableManifest.drop(spark, "postidx_a")
  }

  test("LM probe == lmDirichletRowLocal bit-exact; absent-term decomposition holds on ad-hoc sets") {
    ops.PostingIndex.buildIndex(docs, "postidx_lm")
    try {
      // the shipped key's exact output reproduces through the index
      val viaKey = asTuples(ops.InfoTheory.textLmDirichletTopk(spark, dir))
      val viaIdx = asTuples(ops.PostingIndex.lmTopk(
        spark, "postidx_lm", ops.InfoTheory.Bm25QueryTerms))
      assert(viaIdx === viaKey)
      // ad-hoc sets: the probe's absent-term decomposition must sum to
      // the row-local wide-column score exactly (identical L20 terms)
      for (terms <- Seq(Seq("data", "query"), Seq("customer"),
          Seq("merge", "sort", "join", "hash", "scan"))) {
        val ref = asTuples(ops.InfoTheory.lmDirichletRowLocal(docs, terms))
        val got = asTuples(ops.PostingIndex.lmTopk(spark, "postidx_lm", terms))
        assert(got === ref, s"terms=$terms")
      }
      // duplicate terms normalize identically on both paths
      val refDup = asTuples(ops.InfoTheory.lmDirichletRowLocal(docs, Seq("data", "data", "query")))
      val gotDup = asTuples(ops.PostingIndex.lmTopk(spark, "postidx_lm", Seq("data", "data", "query")))
      assert(gotDup === refDup)
    } finally io.TableManifest.drop(spark, "postidx_lm")
  }

  test("probe scan is bucket-pruned to the query terms; index side never re-shuffles by term") {
    ops.PostingIndex.buildIndex(docs, "postidx_b")
    try {
      val df = ops.PostingIndex.bm25Topk(spark, "postidx_b", Seq("spark"))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val scanLines = p.linesIterator.filter(_.contains("SelectedBucketsCount")).toSeq
      assert(scanLines.nonEmpty, s"expected bucket pruning:\n$p")
      // 1 term -> exactly 1 of 8 buckets read on every pruned scan
      assert(scanLines.forall(_.contains("SelectedBucketsCount: 1 out of 8")),
        scanLines.mkString("\n"))
      // no exchange re-partitions the postings by term (the layout IS
      // the term clustering); only the per-doc rollup shuffles hits
      assert(!p.contains("Exchange hashpartitioning(term"), p)
    } finally io.TableManifest.drop(spark, "postidx_b")
  }

  test("append sees the union corpus; compact collapses stats and preserves every probe") {
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 =!= 0)
    ops.PostingIndex.buildIndex(half1, "postidx_c")
    try {
      ops.PostingIndex.appendToIndex(half2, "postidx_c")
      val terms = Seq("window", "stream")
      val ref = asTuples(ops.InfoTheory.bm25RowLocal(docs, terms))
      assert(asTuples(ops.PostingIndex.bm25Topk(spark, "postidx_c", terms)) === ref)
      // stats sidecar is per-batch (2 rows) until compaction sums it
      val t0 = ops.PostingIndex.resolveTable(spark, "postidx_c")
      assert(spark.table(t0 + "_stats").count() === 2L)
      ops.PostingIndex.compact(spark, "postidx_c")
      val t1 = ops.PostingIndex.resolveTable(spark, "postidx_c")
      assert(t1 !== t0)
      assert(spark.table(t1 + "_stats").count() === 1L)
      assert(asTuples(ops.PostingIndex.bm25Topk(spark, "postidx_c", terms)) === ref)
    } finally io.TableManifest.drop(spark, "postidx_c")
  }

  test("streaming ingest converges to from-scratch; crash replay never drifts scores (SHARDED index)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = docs.select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    val (seed, rest) = all.splitAt(all.length / 2)
    val (b1, b2) = rest.splitAt(rest.length / 2)
    val terms = Seq("stream", "merge", "table")
    // sharded: the deployment combination — streaming appends must
    // self-configure onto the composite-key layout via the sidecar
    ops.PostingIndex.buildIndex(seed.toSeq.toDF("doc_id", "text"), "postidx_s",
      buckets = 8, shards = 4)
    try {
      val stream = MemoryStream[(Long, String)]
      val ckpt = java.nio.file.Files.createTempDirectory("postidx-ckpt").toString
      val q = ops.PostingIndex.maintenanceSink(
        stream.toDF().toDF("doc_id", "text"), ckpt, "postidx_s")
      try {
        stream.addData(b1.toSeq); q.processAllAvailable()
        stream.addData(b2.toSeq); q.processAllAvailable()
      } finally q.stop()
      val ref = asTuples(ops.InfoTheory.bm25RowLocal(
        all.toSeq.toDF("doc_id", "text"), terms))
      assert(asTuples(ops.PostingIndex.bm25Topk(spark, "postidx_s", terms)) === ref)

      // crash AFTER the postings append, BEFORE the stats row: replay
      // re-applies; postings duplicate (probe-deduped), stats stay
      // exactly-once, scores identical
      val extra = Seq((900001L, "stream stream merge extra doc"),
        (900002L, "table scan extra"))
      val full = all.toSeq ++ extra
      intercept[RuntimeException] {
        ops.PostingIndex.appendBatch(extra.toDF("doc_id", "text"), 77L, "postidx_s",
          afterPostingsAppend = () => throw new RuntimeException("crash"))
      }
      assert(ops.PostingIndex.appendBatch(
        extra.toDF("doc_id", "text"), 77L, "postidx_s"))
      val ref2 = asTuples(ops.InfoTheory.bm25RowLocal(
        full.toDF("doc_id", "text"), terms))
      assert(asTuples(ops.PostingIndex.bm25Topk(spark, "postidx_s", terms)) === ref2)
      // fully-committed batch replays as a no-op
      assert(!ops.PostingIndex.appendBatch(
        extra.toDF("doc_id", "text"), 77L, "postidx_s"))

      // compactDedup reclaims the crash-duplicated postings rows
      val t0 = ops.PostingIndex.resolveTable(spark, "postidx_s")
      val before = spark.table(t0).count()
      ops.PostingIndex.compactDedup(spark, "postidx_s")
      val t1 = ops.PostingIndex.resolveTable(spark, "postidx_s")
      val after = spark.table(t1).count()
      assert(after < before, s"$before -> $after")
      assert(spark.table(t1).count() === spark.table(t1).distinct().count())
      assert(asTuples(ops.PostingIndex.bm25Topk(spark, "postidx_s", terms)) === ref2)
      // compaction must PRESERVE the committed ledger: the collapsed
      // stats row carries the high-water batch_id, so a checkpoint-less
      // replay of batch 77 after compaction is still a no-op (the
      // r11-advice double-count scenario: crash after commit, compact,
      // restart)
      assert(spark.table(t1 + "_stats").count() === 1L)
      assert(!ops.PostingIndex.appendBatch(
        extra.toDF("doc_id", "text"), 77L, "postidx_s"))
      assert(asTuples(ops.PostingIndex.bm25Topk(spark, "postidx_s", terms)) === ref2)
    } finally io.TableManifest.drop(spark, "postidx_s")
  }

  test("doc-sharded index: probe bit-exact, hot term spreads across shard buckets, append keeps layout") {
    ops.PostingIndex.buildIndex(docs, "postidx_sh", buckets = 8, shards = 4)
    try {
      // bit-exact vs the row-local reference, single- and multi-term
      for (terms <- Seq(Seq("data"), Seq("merge", "sort", "join", "hash", "scan"))) {
        val ref = asTuples(ops.InfoTheory.bm25RowLocal(docs, terms))
        assert(asTuples(ops.PostingIndex.bm25Topk(spark, "postidx_sh", terms)) === ref,
          s"terms=$terms")
      }
      // a 1-term probe enumerates 4 (term,shard) keys -> pruned to >1
      // and <=4 of 8 buckets (the parallelism the unsharded layout
      // collapses to 1); pruning itself must still be in effect
      val df = ops.PostingIndex.bm25Topk(spark, "postidx_sh", Seq("data"))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val counts = "SelectedBucketsCount: (\\d+) out of 8".r
        .findAllMatchIn(p).map(_.group(1).toInt).toSeq
      assert(counts.nonEmpty, s"expected bucket pruning:\n$p")
      assert(counts.forall(c => c >= 2 && c <= 4), s"bucket spread: $counts")
      // append self-configures onto the sharded layout
      val extra = Seq((800001L, "data data merge appended doc"))
      import spark.implicits._
      ops.PostingIndex.appendToIndex(extra.toDF("doc_id", "text"), "postidx_sh")
      val union = docs.select("doc_id", "text")
        .union(extra.toDF("doc_id", "text"))
      val ref2 = asTuples(ops.InfoTheory.bm25RowLocal(union, Seq("data", "merge")))
      assert(asTuples(ops.PostingIndex.bm25Topk(
        spark, "postidx_sh", Seq("data", "merge"))) === ref2)
    } finally io.TableManifest.drop(spark, "postidx_sh")
  }

  test("duplicate query terms normalize identically in probe and row-local reference") {
    ops.PostingIndex.buildIndex(docs, "postidx_d")
    try {
      val dup = Seq("data", "data", "query")
      val ref = asTuples(ops.InfoTheory.bm25RowLocal(docs, dup))
      assert(asTuples(ops.PostingIndex.bm25Topk(spark, "postidx_d", dup)) === ref)
      // and both equal the distinct-list result
      assert(ref === asTuples(ops.InfoTheory.bm25RowLocal(docs, Seq("data", "query"))))
    } finally io.TableManifest.drop(spark, "postidx_d")
  }
}
