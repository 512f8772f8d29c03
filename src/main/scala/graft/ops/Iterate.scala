package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared driver for the synchronous fixed-iteration graph loops
  * ([[Graph.graphPagerank]], [[Graph.graphLabelPropagation]],
  * [[Graph.graphKCore]]) — the Pregel-round pattern as a fold, with
  * an explicit checkpoint cadence.
  *
  * Why a cadence knob instead of a policy: the loop cost at bench SF
  * is per-iteration SYNCHRONOUS BARRIERS, not data, and the right
  * checkpoint frequency is a measured trade between plan-growth and
  * materialization cost. PageRank at sf0.1 (294k edges, 10
  * iterations, local[32]) measured: checkpoint EVERY iteration
  * 11.1 s (each materialization is a barrier), NO checkpoints — one
  * lazy 40-stage DAG — 6.1 s (plan growth + whole-DAG recompute on
  * the single action), every-3 4.1 s (BASELINE.md r7; the shipped
  * cadence). Short loops (3 rounds over a static checkpointed base)
  * measured best with NO in-loop checkpoint at all — label
  * propagation and k-core pass `checkpointAt = never`. At 100 TB the
  * same trade holds with bigger constants: each barrier is a full
  * cluster sync, and an uncheckpointed lineage chain re-executes
  * every prior round's shuffle on failure — so the cadence stays an
  * explicit, per-operator measured choice.
  *
  * The LAST iteration never checkpoints (the consumer's action
  * materializes it anyway — a trailing checkpoint would add one
  * barrier for nothing).
  */
private[ops] object Iterate {

  val never: Int => Boolean = _ => false

  /** Fold `step` over `rounds` (the round index is passed through —
    * loops like PageRank vary the first round), checkpointing after
    * any non-final round where `checkpointAt(k)` holds.
    */
  def fixed(rounds: Range, checkpointAt: Int => Boolean)(init: DataFrame)(
      step: (DataFrame, Int) => DataFrame): DataFrame =
    rounds.foldLeft(init) { (state, k) =>
      val next = step(state, k)
      if (checkpointAt(k) && k != rounds.last) next.localCheckpoint() else next
    }
}
