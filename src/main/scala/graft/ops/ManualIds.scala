package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Durable manual-batch-id reservation for the additive-count
  * services ([[VocabService]], [[GramService]], [[CentroidService]],
  * [[BigramService]]) — the r12 ADVICE fix for the manual-append
  * crash window.
  *
  * The hazard: manual appends take DESCENDING ids (−2, −3, …)
  * derived from the ledger's minimum. The ledger row is written LAST
  * (it is the commit), so a crash after the partial rows land but
  * before the ledger row leaves orphan partials at id −k — and a
  * NEXT manual append, recomputing min(ledger)−1 over the UNCHANGED
  * ledger, would reuse −k for different input; once it commits, the
  * services' max-over-(key, batch_id) replay collapse would merge
  * the two unrelated partials into one garbage batch.
  *
  * The fix: before any partial row exists, the id is reserved with
  * one durable row in a `_resv` sidecar of the physical version
  * table, and the next id is computed below the MINIMUM OF BOTH the
  * ledger and the reservations. A crashed append's id therefore
  * stays burned forever: its orphan partials are invisible (never in
  * the ledger → dropped by every reader's committed semi-join) and
  * unreachable (never reassigned). Compaction rewrites only
  * [[VocabService.effective]]-style committed state into the next
  * version, so orphans are reclaimed, and [[graft.io.TableManifest
  * .vacuum]] drops the `_resv` sidecar together with its version
  * table (the `(_.+)?` version pattern).
  *
  * Single-writer discipline is the services' existing contract
  * (appends are not mutually concurrent-safe), so reserve-then-write
  * needs no locking.
  */
private[ops] object ManualIds {

  private def resvTable(physical: String): String = physical + "_resv"

  /** Reserve and return the next manual (negative) batch id for
    * `physical`, scanning both the stats ledger and prior
    * reservations. The reservation row is durable before return.
    */
  def reserve(spark: SparkSession, physical: String, stats: String): Long = {
    val resv = resvTable(physical)
    val ledgerMin = spark.table(stats)
      .agg(least(coalesce(min(col("batch_id")), lit(-1L)), lit(-1L)))
      .head().getLong(0)
    val reservedMin =
      if (!spark.catalog.tableExists(resv)) -1L
      else {
        spark.catalog.refreshTable(resv)
        spark.table(resv)
          .agg(least(coalesce(min(col("batch_id")), lit(-1L)), lit(-1L)))
          .head().getLong(0)
      }
    val id = math.min(ledgerMin, reservedMin) - 1L
    spark.range(1).select(lit(id).as("batch_id"))
      .write.mode("append").format("parquet").saveAsTable(resv)
    id
  }
}
