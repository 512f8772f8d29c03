package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental shared-substring detection against a PERSISTED
  * positional-gram index — the [[Curation2.dedupSubstringSpan]]
  * counterpart of [[IncrementalDedup]] (third member of the
  * persisted-index family, after the MinHash band index and
  * [[IvfIndex]]). The batch operator self-joins the whole corpus per
  * run; continuous ingestion instead probes each new batch against an
  * append-only index of (gram-hash, gram, doc, pos) rows.
  *
  * Index layout: one row per position-tagged word 3-gram, BUCKETED and
  * sorted by the 8-byte `gh` = xxhash64(lang, gram)
  * ([[graft.io.Sinks.writeBucketed]]) so the probe join leaves the
  * index side exactly as the files lie on disk — no shuffle, no sort;
  * only the new-batch side exchanges, into the index's bucket count
  * (asserted in SubstringIndexSpec). The gram STRING and lang are
  * both stored alongside the hash and re-checked in the join
  * residual — BOTH hash inputs, so a 64-bit collision can never
  * fabricate a match (not even a cross-lang one where the colliding
  * grams happen to be equal) and the reported spans are exact — no
  * doc-store lookup needed on the probe path.
  *
  * Run-finding is the same diagonal gaps-and-islands shape as the
  * batch operator: matching (new_pos, idx_pos) hits collapse onto
  * diagonals; a run of k consecutive 3-gram hits IS a shared span of
  * k+2 tokens. The window clusters on (pair, diagonal) — match-row
  * volume only, never corpus volume.
  */
object SubstringIndex {

  private val n = 3 // word-gram width

  /** Position-tagged gram rows of a (doc_id, lang, text, …) relation —
    * map-only (tokenize + slice; no exchange).
    */
  private[graft] def gramRows(docs: DataFrame): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    docs.filter(trim(col("text")) =!= "")
      .select(col("doc_id"), col("lang"), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), col("lang"),
        explode(transform(sequence(lit(0), size(col("toks")) - n),
          i => struct(i.as("pos"),
            concat_ws(" ", slice(col("toks"), i + 1, lit(n))).as("gram")))).as("pg"))
      .select(xxhash64(col("lang"), col("pg.gram")).as("gh"),
        col("pg.gram").as("gram"), col("lang"), col("doc_id"),
        col("pg.pos").as("pos"))
  }

  /** Create (overwrite) the positional-gram index for a corpus. */
  def buildIndex(docs: DataFrame, tableName: String, buckets: Int = 8): Unit =
    graft.io.Sinks.writeBucketed(
      gramRows(docs).select("gh", "gram", "lang", "doc_id", "pos"),
      tableName, "gh", buckets)

  /** Append a new batch's grams (same bucket spec — parquet append
    * adds files per bucket, never rewrites).
    */
  def appendToIndex(docs: DataFrame, tableName: String, buckets: Int = 8): Unit =
    gramRows(docs).select("gh", "gram", "lang", "doc_id", "pos")
      .write.mode("append")
      .bucketBy(buckets, "gh").sortBy("gh")
      .format("parquet").saveAsTable(tableName)

  /** Shared spans of a new batch against the index: one row per
    * (new_id, indexed_id, new_start, idx_start) maximal run of
    * ≥ `minRun` consecutive matching 3-grams — a shared token span of
    * `run + 2` tokens. Exact (gram-string residual on the hash join).
    */
  def probeSpans(spark: SparkSession, newDocs: DataFrame, tableName: String,
      minRun: Int = 2): DataFrame = {
    val nb = gramRows(newDocs)
      .select(col("gh").as("n_gh"), col("gram").as("n_gram"),
        col("lang").as("n_lang"), col("doc_id").as("new_id"),
        col("pos").as("new_pos"))
    val idx = spark.table(tableName)
    // The gram/lang rechecks are written as RANGE PAIRS, not
    // equalities: `gram === n_gram` would be extracted as a second
    // equi-join key, the required partitioning would become
    // (gh, gram, lang), and the planner would disable the bucketed
    // scan and shuffle BOTH sides (observed). The range predicates
    // stay join residuals, so the equi-key is gh alone — exactly the
    // index's bucket key — while hash collisions are still rejected
    // on both of the hash's inputs.
    val hits = idx.join(nb,
        col("gh") === col("n_gh") &&
          col("gram") >= col("n_gram") && col("gram") <= col("n_gram") &&
          col("lang") >= col("n_lang") && col("lang") <= col("n_lang") &&
          col("doc_id") =!= col("new_id"))
      .select(col("new_id"), col("doc_id").as("indexed_id"),
        col("new_pos"), (col("new_pos") - col("pos")).as("diag"))
    val wi = Window.partitionBy(col("new_id"), col("indexed_id"), col("diag"))
      .orderBy(col("new_pos"))
    hits.withColumn("isl", col("new_pos") - row_number().over(wi))
      .groupBy(col("new_id"), col("indexed_id"), col("diag"), col("isl"))
      .agg(min(col("new_pos")).as("new_start"), count(lit(1)).as("run"))
      .filter(col("run") >= minRun)
      .select(col("new_id"), col("indexed_id"), col("new_start"),
        (col("new_start") - col("diag")).as("idx_start"),
        (col("run") + (n - 1)).as("span_toks"))
      .orderBy("new_id", "indexed_id", "new_start", "idx_start", "span_toks")
  }
}
