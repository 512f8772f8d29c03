package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental connected-component label maintenance (§8.r11.2) —
  * the streaming-CC counterpart of [[ProfileIndex]]: keep a
  * near-duplicate cluster assignment current as batches arrive,
  * without re-running global CC over the corpus per batch.
  *
  * Correctness rests on one identity: a label relation (id, comp)
  * produced by [[Llm.connectedComponents]] is CLOSURE-EQUIVALENT to
  * the edge set it was computed from — the star edges comp→id encode
  * exactly the same connectivity. Therefore
  *
  *   CC(oldEdges ∪ newEdges) = CC(labelStars ∪ newEdges)
  *
  * and, further, any component no new edge touches cannot change
  * (new edges cannot split components, only merge them), so the CC
  * re-run can be RESTRICTED to the touched components' stars plus the
  * new edges — O(batch + touched members), not O(corpus). Untouched
  * labels pass through untouched. Label semantics are preserved
  * (comp = min reachable id): a merge relabels the merged set to its
  * global min because every member of every touched component enters
  * the local closure via its star.
  *
  * 100 TB: `touched` is two semi-joins against the label relation
  * (both on its natural keys — bucket the persisted labels by `comp`
  * and the member lookup is layout-aligned); the local CC's cost
  * scales with the batch's blast radius, which for near-dup graphs is
  * the point — most arrivals touch nothing or one small segment. The
  * label relation itself persists like any versioned table
  * ([[graft.io.TableManifest]]); this module keeps the algebra pure
  * and leaves the pointer commit to the caller's pipeline (see
  * [[ingest]] for the ProfileIndex wiring).
  */
object ClusterMaintenance {

  /** Updated label relation for CC(originalEdges ∪ newEdges), given
    * `labels` = CC(originalEdges) — see the object scaladoc for why
    * the restriction to touched components is exact. `newEdges` may
    * reference both labeled and never-seen ids; isolated new ids
    * (appearing in no edge) stay absent, per the CC contract.
    */
  def updateLabels(labels: DataFrame, newEdges: DataFrame): DataFrame = {
    val edges = newEdges
      .select(col("a_id").cast("long").as("a_id"),
        col("b_id").cast("long").as("b_id"))
      .filter(col("a_id") =!= col("b_id"))
      .localCheckpoint()
    val endpoints = edges.select(col("a_id").as("id"))
      .union(edges.select(col("b_id").as("id"))).distinct()
    val touchedComps = labels
      .join(endpoints, "id", "left_semi")
      .select(col("comp")).distinct()
    val touchedLabels = labels
      .join(touchedComps, Seq("comp"), "left_semi")
    val stars = touchedLabels.filter(col("id") =!= col("comp"))
      .select(col("comp").as("a_id"), col("id").as("b_id"))
    val local = Llm.connectedComponents(stars.unionAll(edges))
    labels.join(local, Seq("id"), "left_anti").unionAll(local)
  }

  /** One ingestion step against a [[ProfileIndex]]: find the batch's
    * qualifying pairs (batch↔indexed via probe + exact verify,
    * batch-internal via the collapsed join over the batch itself),
    * append the batch's signatures to the index, and return the
    * updated label relation. `indexedProfiles` is the corpus the
    * index currently covers (stage-2 verification needs the arrays —
    * the same caller-side relation [[ProfileIndex.verifyExact]]
    * documents). Returns labels equal to from-scratch CC over the
    * union corpus's pair relation (spec'd in ClusterMaintenanceSpec).
    */
  /** Contract notes: `labels` is an (id, comp) relation as
    * [[Llm.connectedComponents]] emits; `newProfiles` must be ids the
    * index has NOT seen (re-ingesting an id appends duplicate
    * signatures — harmless for correctness, since the probe drops
    * self-matches and duplicate collisions dedupe in stage 1's
    * groupBy, but it grows the index; dedupe arrivals upstream, as
    * with [[IncrementalDedup]]).
    */
  def ingest(spark: SparkSession, labels: DataFrame, newProfiles: DataFrame,
      indexedProfiles: DataFrame, tableName: String, p: Int, q: Int): DataFrame = {
    val cross = ProfileIndex.verifyExact(
      ProfileIndex.probe(spark, newProfiles, tableName, p, q),
      newProfiles, indexedProfiles, p, q)
      .select(col("new_id").as("a_id"), col("indexed_id").as("b_id"))
    val intra = Bipartite.deletionPairsCollapsed(newProfiles, p, q,
      ProfileIndex.Depth).select("a_id", "b_id")
    val updated = updateLabels(labels, cross.unionAll(intra))
      .localCheckpoint() // pin before the index mutates under the lazy plan
    ProfileIndex.appendToIndex(newProfiles, tableName)
    updated
  }
}
