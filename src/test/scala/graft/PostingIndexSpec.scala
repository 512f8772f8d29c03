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
    } finally spark.sql("DROP TABLE IF EXISTS postidx_a__v0")
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
    } finally spark.sql("DROP TABLE IF EXISTS postidx_b__v0")
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
    } finally {
      spark.sql("DROP TABLE IF EXISTS postidx_c__v0")
      spark.sql("DROP TABLE IF EXISTS postidx_c__v0_stats")
      spark.sql("DROP TABLE IF EXISTS postidx_c__v1")
      spark.sql("DROP TABLE IF EXISTS postidx_c__v1_stats")
    }
  }

  test("streaming ingest converges to from-scratch; crash replay never drifts scores") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = docs.select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    val (seed, rest) = all.splitAt(all.length / 2)
    val (b1, b2) = rest.splitAt(rest.length / 2)
    val terms = Seq("stream", "merge", "table")
    ops.PostingIndex.buildIndex(seed.toSeq.toDF("doc_id", "text"), "postidx_s")
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
    } finally {
      Seq("postidx_s__v0", "postidx_s__v0_stats", "postidx_s__v1", "postidx_s__v1_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
