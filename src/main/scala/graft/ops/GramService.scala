package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.io.TableManifest

/** Persisted second-moment SERVICE — the Gram-matrix sibling of
  * [[VocabService]] (token counts) and [[CardinalityService]]
  * (distinct keys): each ingest batch folds its embedding vectors
  * ONCE through the [[Embeddings.GramAgg]] accumulator into a
  * d(d+1)/2-cell integer partial, partials append under the manifest
  * pointer, and the served Gram cells ([[cellsOver]]) are the exact
  * SUM of committed partials — row-identical to
  * [[Embeddings.embedGramCells]] recomputed over the concatenated
  * corpus (spec-asserted), because integer Gram cells are ADDITIVE
  * across any corpus split. PCA / whitening / collapse monitors over
  * a growing embedding corpus read KB-sized stored partials, never
  * re-scan vectors.
  *
  * Exactly-once under streaming replay: the [[VocabService]] triple —
  *  1. every partial row carries `batch_id`; the `_stats` ledger (one
  *     row per committed batch: batch_id, n_vecs, d) is written LAST;
  *  2. the replay guard skips a batch at-or-under the ledger high
  *     water (engine ids monotone; compaction preserves high water);
  *  3. crash between partial append and ledger row → orphan rows a
  *     restart re-appends; a batch's partial is DETERMINISTIC
  *     (integer folds), so serving collapses duplicates exactly via
  *     max over (pos, batch_id) before the ledger semi-join and sum.
  * Manual ingests take descending ids −1, −2, … (two same-content
  * manual appends must stay distinct batches — counts are additive).
  *
  * 100 TB: a batch's fold is the Aggregator's one-buffer-per-
  * partition shape (the only exchange of the ingest); the stored
  * table is O(cells · batches-since-compaction) rows — independent of
  * corpus size — and [[compact]] collapses batch growth. Serving
  * cost is the stored-table scan: KBs.
  */
object GramService {

  /** Bump when the stored row layout changes. */
  val SchemaVersion = 1

  private val StatsSuffix = "_stats"

  private def statsTable(physical: String): String = physical + StatsSuffix

  def resolveTable(spark: SparkSession, name: String): String =
    TableManifest.resolve(spark, name, SchemaVersion)

  /** One batch's partial: the raw GramAgg buffer as (pos, g,
    * batch_id) rows — pos 0 carries the batch's vector count, pos
    * k ≥ 1 the (k−1)-th upper-triangle cell. An empty batch yields
    * zero rows (the empty buffer), which serves as an exact zero.
    */
  private def partial(emb: DataFrame, batchId: Long): DataFrame =
    emb
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * lit(Embeddings.GramScale)).cast("long")).as("q"))
      .agg(udaf(new Embeddings.GramAgg, ExpressionEncoder[Array[Long]]())(col("q")).as("b"))
      .select(posexplode(col("b")).as(Seq("pos", "g")))
      .select(col("pos").cast("long").as("pos"), col("g"),
        lit(batchId).as("batch_id"))

  /** Ledger row: batch id, vector count, and the dimension (0 for an
    * empty batch — [[dimOf]] takes the max over the ledger).
    */
  private def ledgerRow(spark: SparkSession, emb: DataFrame,
      batchId: Long): DataFrame = {
    val d = emb.select(size(col("embedding"))).limit(1).collect()
      .headOption.map(_.getInt(0).toLong).getOrElse(0L)
    emb.agg(count(lit(1)).as("n_vecs"))
      .select(lit(batchId).as("batch_id"), col("n_vecs"), lit(d).as("d"))
  }

  /** Fold + persist an embeddings table as a fresh manifest version
    * (batch id −1).
    */
  def build(spark: SparkSession, name: String, emb: DataFrame): Unit = {
    val v = TableManifest.nextVersion(spark, name)
    val t = TableManifest.physicalName(name, v)
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"DROP TABLE IF EXISTS ${statsTable(t)}")
    partial(emb, -1L).write.mode("overwrite").format("parquet").saveAsTable(t)
    ledgerRow(spark, emb, -1L).write.mode("overwrite")
      .format("parquet").saveAsTable(statsTable(t))
    TableManifest.commit(spark, name, v, SchemaVersion)
    TableManifest.vacuum(spark, name)
  }

  /** Manual append of new vectors (additive — the same vector
    * appended twice counts twice, as corpus concatenation would).
    * Descending manual ids keep repeated same-content appends
    * distinct; the id is reserved durably BEFORE partials land
    * ([[ManualIds]] — the r12 ADVICE crash-window fix: a colliding
    * reuse after a crashed append would make the max-collapse merge
    * two unrelated partials' pos cells). `afterPartialsAppend` is
    * the spec's crash-injection seam.
    */
  def appendVecs(emb: DataFrame, name: String,
      afterPartialsAppend: () => Unit = () => ()): Unit = {
    val spark = emb.sparkSession
    val t = resolveTable(spark, name)
    spark.catalog.refreshTable(statsTable(t))
    val manualId = ManualIds.reserve(spark, t, statsTable(t))
    partial(emb, manualId).write.mode("append").format("parquet").saveAsTable(t)
    afterPartialsAppend()
    ledgerRow(spark, emb, manualId).write.mode("append")
      .format("parquet").saveAsTable(statsTable(t))
  }

  /** Exactly-once-guarded streaming ingest of one engine batch —
    * partials FIRST, ledger row LAST (see the scaladoc top for the
    * crash-window argument). Returns true if applied.
    */
  private[graft] def appendBatch(emb: DataFrame, batchId: Long,
      name: String,
      afterPartialsAppend: () => Unit = () => ()): Boolean = {
    val spark = emb.sparkSession
    val t = resolveTable(spark, name)
    spark.catalog.refreshTable(statsTable(t))
    val committed = spark.table(statsTable(t))
      .filter(col("batch_id") >= batchId).limit(1).count() > 0
    if (committed) false
    else {
      partial(emb, batchId).write.mode("append").format("parquet").saveAsTable(t)
      afterPartialsAppend() // crash-injection seam (spec)
      ledgerRow(spark, emb, batchId).write.mode("append")
        .format("parquet").saveAsTable(statsTable(t))
      true
    }
  }

  /** The exact effective buffer relation (pos, g): replay duplicates
    * collapse via max over (pos, batch_id) — a batch's partial is
    * deterministic — then uncommitted orphans drop via the ledger
    * semi-join, then batches sum.
    */
  private def effective(spark: SparkSession, physical: String): DataFrame = {
    val committed = spark.table(statsTable(physical)).select(col("batch_id"))
    spark.table(physical)
      .groupBy(col("pos"), col("batch_id"))
      .agg(max(col("g")).as("g"))
      .join(broadcast(committed), Seq("batch_id"), "left_semi")
      .groupBy(col("pos"))
      .agg(sum(col("g")).as("g"))
  }

  /** The stored dimension (max over ledger rows — empty batches
    * record 0).
    */
  def dimOf(spark: SparkSession, name: String): Int = {
    val t = resolveTable(spark, name)
    spark.catalog.refreshTable(statsTable(t))
    spark.table(statsTable(t))
      .agg(coalesce(max(col("d")), lit(0L))).head().getLong(0).toInt
  }

  /** The served Gram relation (i, j, n_vecs, g) — row-identical to
    * [[Embeddings.embedGramCells]] over the concatenated ingested
    * corpus (spec-asserted; additivity of integer cells is the whole
    * proof). Empty service → empty relation.
    */
  def cellsOver(spark: SparkSession, name: String): DataFrame = {
    val t = resolveTable(spark, name)
    spark.catalog.refreshTable(t)
    spark.catalog.refreshTable(statsTable(t))
    val d = dimOf(spark, name)
    val idx = spark.createDataFrame(
      (for { i <- 0 until d; j <- i until d } yield (i, j)).zipWithIndex
        .map { case ((i, j), k) => (k.toLong + 1L, i.toLong, j.toLong) })
      .toDF("pos", "i", "j")
    val eff = effective(spark, t)
    val n = eff.filter(col("pos") === 0L).select(col("g").as("n_vecs"))
    eff.join(broadcast(idx), "pos")
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"), col("n_vecs"), col("g"))
      .orderBy("i", "j")
  }

  /** Collapse batch growth into one partial at the ledger high water
    * (fresh version, atomic publish — the [[PostingIndex.compact]]
    * discipline: the high-water id keeps the replay guard sound after
    * compaction).
    */
  def compact(spark: SparkSession, name: String): Unit = {
    val t = resolveTable(spark, name)
    spark.catalog.refreshTable(t)
    spark.catalog.refreshTable(statsTable(t))
    val ledger = spark.table(statsTable(t))
    val hw = ledger.agg(max(col("batch_id"))).head().getLong(0)
    val collapsed = effective(spark, t).withColumn("batch_id", lit(hw))
      .select(col("pos"), col("g"), col("batch_id"))
    val ledgerCollapsed = ledger
      .agg(sum(col("n_vecs")).as("n_vecs"),
        coalesce(max(col("d")), lit(0L)).as("d"))
      .select(lit(hw).as("batch_id"), col("n_vecs"), col("d"))
    val v = TableManifest.nextVersion(spark, name)
    val t2 = TableManifest.physicalName(name, v)
    spark.sql(s"DROP TABLE IF EXISTS $t2")
    spark.sql(s"DROP TABLE IF EXISTS ${statsTable(t2)}")
    collapsed.write.mode("overwrite").format("parquet").saveAsTable(t2)
    ledgerCollapsed.write.mode("overwrite").format("parquet")
      .saveAsTable(statsTable(t2))
    TableManifest.commit(spark, name, v, SchemaVersion)
    TableManifest.vacuum(spark, name)
  }

  /** Corpus totals from the ledger alone: (batches, vectors, dim). */
  def stats(spark: SparkSession, name: String): (Long, Long, Int) = {
    val t = resolveTable(spark, name)
    spark.catalog.refreshTable(statsTable(t))
    val r = spark.table(statsTable(t))
      .agg(count(lit(1)), sum(col("n_vecs")), coalesce(max(col("d")), lit(0L)))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2).toInt)
  }
}
