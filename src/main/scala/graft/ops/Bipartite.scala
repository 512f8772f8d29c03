package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Readers.table

/** Bipartite-projection profile analytics (§8.r10.2): project the
  * customer×part interaction fact onto the small brand axis — each
  * customer's DISTINCT brand set is their "purchase profile" — then
  * run an EXACT all-pairs similarity join over the profiles.
  *
  * This is the corpus where the r9 all-pairs rejection gets its
  * positive counterpart: adjacency sets over the part graph barely
  * overlapped (zero qualifying pairs at τ = 1/2, BASELINE.md r9), but
  * brand profiles are DENSE sets over a 25-element universe (avg 19
  * of 25 at sf0.01) — near-identical profiles genuinely exist (3,788
  * pairs at τ = 0.95, sf0.01), so an all-pairs join finally has
  * something to emit.
  *
  * Dense-small-universe changes the right algorithm: the PPJoin
  * prefix filter indexes each set's RAREST elements, but a 25-value
  * near-uniform brand axis has nothing rare — its candidate volume is
  * Σ prefix-df ≈ n·2·(n·avg_share), quadratic in n with a small
  * constant (measured, BASELINE.md r10), and the shared-count join's
  * Σ df² is catastrophically quadratic (3.3·10⁹ joined rows at
  * sf0.1). The winning shape at high τ is the DELETION NEIGHBORHOOD
  * (SymSpell-style, Bocek et al. 2007 "Fast Similarity Search in
  * Large Dictionaries"): at τ = 0.95 a qualifying pair's symmetric
  * difference is ≤ 1 (Δ = u − i ≤ (1−τ)·u, and u ≤ 26 here), and
  * every Δ ≤ 1 pair shares a signature in
  * {full set} ∪ {all single-element deletions}: equal sets share the
  * full signature; B = A∖{x} makes B's full signature equal A's
  * x-deletion. Signature volume is n·(sz+1) rows — LINEAR in
  * profiles — and signature groups are exact-subset matches, so
  * collisions are semantically close pairs, not hot-key noise.
  *
  * Completeness bound (scaladoc'd, gate-enforced): Δ ≤ 1 covers
  * J ≥ τ exactly while (1−τ)·u_max < 2, i.e. u_max ≤ 39 at
  * τ = 0.95; the brand universe (25) sits far inside. A corpus that
  * outgrew the bound would need deletion depth d = ⌊(1−τ)·u_max⌋
  * (cost n·sz^d) — and would show up immediately as a gate failure
  * against the brute-force oracle, which never assumes the bound.
  *
  * 100 TB: the projection is one distinct + one map-side-combinable
  * collect_set, both clustered on custkey; signatures are a row-local
  * 26× fan-out of the |customers|-row profile relation; the
  * signature self-join shuffles on the 64-bit sig hash (hash
  * collisions only ADD candidates — every candidate is verified with
  * the exact integer predicate 20·i ≥ 19·u before emit). Nothing is
  * n², nothing driver-side.
  */
object Bipartite {

  import Relational.Q

  /** The (customer, brand) bipartite projection: one row per distinct
    * (custkey, brand) interaction. Brand dim broadcasts into the
    * lineitem scan; orders joins on the shuffle key l_orderkey.
    */
  private def brandSets(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val ord = table(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val prt = table(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    li.join(broadcast(prt), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("p_brand").as("e"))
      .distinct()
  }

  /** Per-customer profile: sorted distinct brand array (total order —
    * collect_set is order-unstable, sort_array pins it).
    */
  private def profiles(s: SparkSession, dir: String): DataFrame =
    brandSets(s, dir)
      .groupBy(col("c"))
      .agg(sort_array(collect_set(col("e"))).as("brands"))

  /** The projection as an oracle'd key: (custkey, n_brands, profile).
    */
  val ordersBrandProfile: Q = (s, dir) =>
    profiles(s, dir)
      .select(col("c").as("custkey"),
        size(col("brands")).cast("long").as("n_brands"),
        concat_ws(",", col("brands")).as("profile"))
      .orderBy("custkey")

  /** Exact all-pairs profile similarity at τ = 0.95 via deletion
    * neighborhoods — see the object scaladoc for why this formulation
    * wins on a dense small universe and when Δ ≤ 1 blocking is
    * complete. Emits every customer pair with Jaccard(brands) ≥ 0.95:
    * (a_id < b_id, inter, uni, jaccard), where the predicate is the
    * integer form 20·i ≥ 19·u and jaccard is the single division i/u.
    */
  val simProfileAllpairs: Q = (s, dir) =>
    allpairsFromProfiles(profiles(s, dir))

  /** The deletion-neighborhood join over any (c, brands sorted array)
    * profile relation — split out so specs can drive planted
    * profiles through the exact blocking/verify path.
    */
  private[graft] def allpairsFromProfiles(profilesDf: DataFrame): DataFrame = {
    // Materialize the profile relation once: the signature self-join
    // reads it from both sides, and an unmaterialized plan would
    // re-run the projection scans per side.
    val prof = profilesDf.localCheckpoint()
    // {full set} ∪ {single deletions}; empty deletion signatures of
    // singleton profiles are dropped — at scale every singleton would
    // collide on the empty signature (a pure hot-key with no possible
    // qualifying pair behind it: two distinct singletons have J ≤ 1/2).
    val sigs = prof.select(col("c"), explode(
      concat(array(col("brands")),
        transform(sequence(lit(0), size(col("brands")) - 1),
          i => filter(col("brands"), (_, j) => j =!= i)))).as("sigarr"))
      .filter(size(col("sigarr")) >= 1)
      .select(col("c"), xxhash64(concat_ws(",", col("sigarr"))).as("sig"))
    // The collision join carries ONLY (sig, id, id): a close pair
    // collides on up to sz+1 signatures, so the pair set is deduped
    // while the rows are 16 bytes — shuffling the brand arrays per
    // collision row measured 19.8 s vs 9.0 s for this shape at sf0.1
    // (BASELINE.md r10). The arrays re-attach afterwards from the
    // checkpointed profile relation, once per candidate side.
    val cand = sigs.select(col("sig"), col("c").as("a_id"))
      .join(sigs.select(col("sig"), col("c").as("b_id")), Seq("sig"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    cand
      .join(prof.select(col("c").as("a_id"), col("brands").as("a_br")), "a_id")
      .join(prof.select(col("c").as("b_id"), col("brands").as("b_br")), "b_id")
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("a_br"), col("b_br"))).cast("long").as("inter"),
        (size(col("a_br")) + size(col("b_br")) -
          size(array_intersect(col("a_br"), col("b_br")))).cast("long").as("uni"))
      .filter(col("inter") * 20 >= col("uni") * 19)
      .withColumn("jaccard",
        col("inter").cast("double") / col("uni").cast("double"))
      .orderBy("a_id", "b_id")
  }

  val queries: Map[String, Q] = Map(
    "orders_brand_profile" -> ordersBrandProfile,
    "sim_profile_allpairs" -> simProfileAllpairs,
  )
}
