package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.NumericExpressions.log2Fixed

/** Persisted inverted index with BM25 probe — the AD-HOC half of the
  * retrieval story: [[InfoTheory.textBm25Topk]] handles a literal
  * query-term set with zero shuffles, but an ad-hoc query (terms known
  * only at probe time) would re-scan and re-tokenize the whole corpus
  * per query. This index pays the tokenize ONCE: the (term, doc_id,
  * tf, dl) posting relation persists BUCKETED AND SORTED BY TERM
  * ([[graft.io.Sinks.writeBucketed]]), so a probe reads only the
  * buckets its terms hash to (bucket pruning, asserted in spec) and
  * joins nothing corpus-sized.
  *
  * `dl` is denormalized into the posting row — the BM25 length
  * normalization needs it per (doc, term) hit, and storing 8 bytes per
  * posting beats a corpus-wide (doc → dl) join at probe time.
  *
  * Corpus statistics (N, Σdl) live in an APPEND-ONLY `_stats` sidecar:
  * one row per build/append batch, probes SUM them — so appends never
  * rewrite anything (the crash-window-free discipline of the
  * [[ProfileIndex]] family; the batch contract is the usual
  * append-new-docs-only). The probe recomputes df from the probed
  * postings themselves — df is a per-term count over exactly the rows
  * already read, never a second corpus pass.
  *
  * Versioning: [[graft.io.TableManifest]] — the postings table and its
  * stats sidecar publish under one atomic pointer; depth of the
  * layout is the row schema itself ([[SchemaVersion]]).
  *
  * 100 TB: the index is one tokenize + one (doc,term) aggregate at
  * build (linear, map-side combined); probe cost is
  * O(Σ_t |postings(t)|) — the classic search-engine economics —
  * with the per-doc score rollup shuffling only probed hits.
  * MEASURED boundary (ScratchBm25Corpus @ 10⁷ docs / 3.7·10⁸
  * postings, BASELINE.md r11): rare-term probes 3.5 s vs 21–33 s for
  * the indexless full scan — but STOP-WORD-hot terms (~70 % df) probe
  * SLOWER than the full scan (87–127 s), because bucket pruning
  * collapses read parallelism to the probed buckets while the posting
  * lists are corpus-sized. The production path for hot terms is the
  * standard one: doc-sharded posting lists (a shard column alongside
  * term, probe enumerates (term, shard) pairs) — or simply routing
  * high-df terms to the scan path, since a term in most documents
  * carries near-zero idf weight anyway.
  */
object PostingIndex {

  /** Bump when the posting row layout changes. */
  val SchemaVersion = 1

  private val StatsSuffix = "_stats"

  def resolveTable(spark: SparkSession, tableName: String): String =
    graft.io.TableManifest.resolve(spark, tableName, SchemaVersion)

  private def statsTable(physical: String): String = physical + StatsSuffix

  private def toks(c: org.apache.spark.sql.Column) =
    split(lower(regexp_replace(trim(c), "\\s+", " ")), " ")

  /** The posting relation of a documents table: (term, doc_id, tf, dl),
    * one exchange (the doc_id clustering serves the tf aggregate and
    * the dl window — the entropy-family argument).
    */
  private[graft] def postingRows(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .repartition(col("doc_id"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("dl", sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))

  /** One stats row per ingest; `batch_id` = −1 for build/manual
    * appends, the engine's batchId for streaming ingest (the
    * exactly-once guard key).
    */
  private def batchStats(rows: DataFrame, batchId: Long): DataFrame =
    rows.agg(countDistinct(col("doc_id")).as("n_docs"),
      sum(col("tf")).as("total_tok"))
      .withColumn("batch_id", lit(batchId))

  /** Tokenize + index a documents table as a fresh manifest version.
    * Stats come from reading the WRITTEN table back (a column-pruned
    * (doc_id, tf) scan of what was just laid down) — NOT from a
    * localCheckpoint of the posting relation: materializing ~40
    * postings/doc through the block manager measured 10× the cost of
    * the read-back at 10⁷ docs (ScratchBm25Corpus, BASELINE.md r11).
    */
  def buildIndex(docs: DataFrame, tableName: String, buckets: Int = 8): Unit = {
    val spark = docs.sparkSession
    val v = graft.io.TableManifest.nextVersion(spark, tableName)
    val t = graft.io.TableManifest.physicalName(tableName, v)
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"DROP TABLE IF EXISTS ${statsTable(t)}")
    graft.io.Sinks.writeBucketed(postingRows(docs), t, "term", buckets)
    batchStats(spark.table(t), -1L).write.mode("overwrite").format("parquet")
      .saveAsTable(statsTable(t))
    graft.io.TableManifest.commit(spark, tableName, v, SchemaVersion)
    graft.io.TableManifest.vacuum(spark, tableName)
  }

  /** Append a NEW batch of documents (caller contract: doc_ids not
    * already indexed). Postings append per bucket; the stats sidecar
    * gains one row — nothing rewrites, so probes racing an append see
    * a consistent (if slightly stale) corpus.
    */
  def appendToIndex(docs: DataFrame, tableName: String): Unit = {
    val spark = docs.sparkSession
    val t = resolveTable(spark, tableName)
    val buckets = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(t))
      .bucketSpec.map(_.numBuckets).getOrElse(throw new IllegalStateException(
        s"$t has no bucket spec — appending would mix layouts; rebuild the index"))
    val rows = postingRows(docs).localCheckpoint()
    rows.write.mode("append")
      .bucketBy(buckets, "term").sortBy("term")
      .format("parquet").saveAsTable(t)
    batchStats(rows, -1L).write.mode("append").format("parquet")
      .saveAsTable(statsTable(t))
  }

  /** Collapse append growth into a fresh version (atomic publish).
    * The stats sidecar is carried BY HAND in the pre-commit window —
    * [[graft.io.TableManifest.compactBucketed]] only rewrites the
    * main table — and its per-batch rows collapse to one summed row
    * on the way (a resolved version is always self-contained; vacuum
    * reclaims old sidecars via the version-pattern suffix match).
    * A crash between the sidecar write and the commit leaves an
    * unreferenced staging pair, reclaimed by the next compaction's
    * DROPs — probes keep serving the old version either way.
    */
  def compact(spark: SparkSession, tableName: String): Unit = {
    val cur = resolveTable(spark, tableName)
    graft.io.TableManifest.compactBucketed(spark, tableName, SchemaVersion,
      beforeCommit = () => {
        val nextT = graft.io.TableManifest.physicalName(tableName,
          graft.io.TableManifest.nextVersion(spark, tableName))
        spark.sql(s"DROP TABLE IF EXISTS ${statsTable(nextT)}")
        spark.table(statsTable(cur))
          .agg(sum(col("n_docs")).as("n_docs"),
            sum(col("total_tok")).as("total_tok"))
          .withColumn("batch_id", lit(-1L))
          .write.mode("overwrite").format("parquet")
          .saveAsTable(statsTable(nextT))
      })
  }

  /** Ad-hoc BM25 top-k probe: reads ONLY the buckets the query terms
    * hash to; df comes from the probed postings, N/avgdl from the
    * summed stats sidecar; the integer score pipeline is bit-identical
    * to [[InfoTheory.bm25RowLocal]] (spec'd equal on arbitrary term
    * sets). Output: (doc_id, n_hit, bm25_u, bm25).
    */
  def bm25Topk(spark: SparkSession, tableName: String, terms: Seq[String],
      k: Int = 10): DataFrame = {
    val t = resolveTable(spark, tableName)
    // probe-time freshness: appends may come from OTHER sessions (the
    // streaming microbatch clone) whose saveAsTable invalidates only
    // their own relation cache — this session's cached file listing
    // would silently serve the pre-append corpus (found when the
    // build's stats read-back started priming that cache). A refresh
    // is a metadata re-list, not a data read.
    spark.catalog.refreshTable(t)
    spark.catalog.refreshTable(statsTable(t))
    // dropDuplicates on the probe key: streaming-replay appends are
    // at-least-once (verbatim row duplicates) — the dedup costs only
    // the probed rows and is the identity on a clean index
    val hits = spark.table(t).filter(col("term").isin(terms: _*))
      .dropDuplicates("term", "doc_id")
    val corp = spark.table(statsTable(t))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_tok")).as("total_tok"))
      .withColumn("avgdl_u", expr("total_tok * 1000000 div n_docs"))
    val idf = hits.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(corp))
      .withColumn("idf20",
        log2Fixed(lit(2) * col("n_docs") + lit(2)) -
          log2Fixed(lit(2) * col("df") + lit(1)))
      .select(col("term"), col("idf20"), col("avgdl_u"))
    hits.join(broadcast(idf), "term")
      .withColumn("norm_ppm",
        expr(s"${InfoTheory.Bm25OneMinusBPpm} + ${InfoTheory.Bm25BPpm} * " +
          "(dl * 1000000000000 div avgdl_u) div 1000000"))
      .withColumn("sat_ppm",
        expr(s"tf * ${InfoTheory.Bm25K1p1Ppm} * 1000000 div " +
          s"(tf * 1000000 + ${InfoTheory.Bm25K1Ppm} * norm_ppm div 1000000)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit"),
        sum(col("idf20") * col("sat_ppm")).as("bm25_u"))
      .orderBy(col("bm25_u").desc, col("doc_id"))
      .limit(k)
      .withColumn("bm25",
        col("bm25_u").cast("double") / lit(1048576.0) / lit(1000000.0)
          * lit(0.6931471805599453))
      .select(col("doc_id"), col("n_hit"), col("bm25_u"), col("bm25"))
  }

  /** Exactly-once-guarded streaming ingest of one engine batch:
    * SKIP if the stats sidecar already carries this batch_id (the
    * batch fully committed before a restart); otherwise append
    * postings FIRST, stats row LAST. Crash windows, by order:
    * after postings / before stats → replay re-appends the postings
    * (verbatim duplicates — neutral: the probe dedups on
    * (term, doc_id) and [[compactDedup]] reclaims) and writes the
    * stats row once, so N and Σdl are EXACTLY-once — scores never
    * drift under replay. Returns true if the batch was applied.
    */
  private[graft] def appendBatch(docs: DataFrame, batchId: Long,
      tableName: String,
      afterPostingsAppend: () => Unit = () => ()): Boolean = {
    val spark = docs.sparkSession
    val t = resolveTable(spark, tableName)
    spark.catalog.refreshTable(statsTable(t)) // replay guard must see the latest commit
    val committed = spark.table(statsTable(t))
      .filter(col("batch_id") === batchId).limit(1).count() > 0
    if (committed) false
    else {
      val buckets = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t))
        .bucketSpec.map(_.numBuckets).getOrElse(throw new IllegalStateException(
          s"$t has no bucket spec — rebuild the index"))
      val rows = postingRows(docs).localCheckpoint()
      rows.write.mode("append")
        .bucketBy(buckets, "term").sortBy("term")
        .format("parquet").saveAsTable(t)
      afterPostingsAppend() // crash-injection seam (spec)
      batchStats(rows, batchId).write.mode("append").format("parquet")
        .saveAsTable(statsTable(t))
      true
    }
  }

  /** Streaming wiring: continuous index maintenance as a foreachBatch
    * sink — the engine's monotone batchId drives [[appendBatch]]'s
    * replay guard, so a checkpoint restart is clean. Batch contract
    * as everywhere in the family: new doc_ids only.
    */
  def maintenanceSink(stream: DataFrame, checkpointDir: String,
      tableName: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
        if (!b.isEmpty) { appendBatch(b, batchId, tableName); () }
      }
      .start()

  /** [[compact]] that also reclaims replay-duplicated posting rows:
    * duplicates are VERBATIM row copies (same (term, doc_id, tf, dl)
    * — a doc's postings are deterministic), so a full-row distinct
    * restores the clean index; probe semantics unchanged (it was
    * already dedup-guarded). Stats rows are exactly-once by
    * construction and just collapse.
    */
  def compactDedup(spark: SparkSession, tableName: String): Unit = {
    val cur = resolveTable(spark, tableName)
    graft.io.TableManifest.compactBucketed(spark, tableName, SchemaVersion,
      beforeCommit = () => {
        val nextT = graft.io.TableManifest.physicalName(tableName,
          graft.io.TableManifest.nextVersion(spark, tableName))
        spark.sql(s"DROP TABLE IF EXISTS ${statsTable(nextT)}")
        spark.table(statsTable(cur))
          .agg(sum(col("n_docs")).as("n_docs"),
            sum(col("total_tok")).as("total_tok"))
          .withColumn("batch_id", lit(-1L))
          .write.mode("overwrite").format("parquet")
          .saveAsTable(statsTable(nextT))
      },
      transform = _.distinct())
  }
}
