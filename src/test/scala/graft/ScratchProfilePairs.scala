package graft

import org.apache.spark.sql.functions._

/** §8.r10.2 measurement harness: three formulations of the τ = 0.95
  * all-pairs brand-profile similarity join, timed end-to-end
  * (count()) on SPARK_GRAFT_SF_DIR. Results → BASELINE.md r10 row.
  *
  *   A (shipped)  deletion-neighborhood signature join (ops.Bipartite)
  *   B            shared-count: element self-join + (a,b) count agg —
  *                Σ df² joined rows (the r6/r9 baseline shape)
  *   C            PairJoins prefix filter (divisor 20 = the τ = 0.95
  *                pigeonhole bound), candidates only — its floor cost
  *                before any verification
  */
object ScratchProfilePairs {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def cb = graft.io.Readers.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(graft.io.Readers.table(spark, dir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .join(graft.io.Readers.table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("p_brand").as("e"))
      .distinct()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    // warm shared scans
    cb.count()

    // SPARK_GRAFT_FORMS=A,C → skip the shared-count form: at sf0.1 its
    // Σ df² = 3.3e9 joined rows wedge the executor (heartbeat-killed
    // after 8 min in a single AQE-coalesced partition — the input side
    // is 8 MB, so AQE coalesces to one partition and the fan-out runs
    // on one core; measured 2026-08-14).
    val forms = sys.env.getOrElse("SPARK_GRAFT_FORMS", "A,B,C").split(",").toSet

    if (forms("A")) time("A deletion-sig") {
      ops.Bipartite.simProfileAllpairs(spark, dir).count()
    }

    if (forms("B")) time("B shared-count") {
      val base = cb.localCheckpoint()
      val sz = base.groupBy("c").agg(count(lit(1)).as("sz"))
      val pairs = base.select(col("c").as("ca"), col("e"))
        .join(base.select(col("c").as("cb2"), col("e")), "e")
        .filter(col("ca") < col("cb2"))
        .groupBy("ca", "cb2").agg(count(lit(1)).as("i"))
      pairs
        .join(sz.select(col("c").as("ca"), col("sz").as("sa")), "ca")
        .join(sz.select(col("c").as("cb2"), col("sz").as("sb")), "cb2")
        .filter(col("i") * 20 >= (col("sa") + col("sb") - col("i")) * 19)
        .count()
    }

    // D: deletion depth d=2 at τ=0.9 (Δ≤2 complete while u ≤ 29):
    // signatures = full ∪ 1-deletions ∪ 2-deletions (≈ sz²/2 per
    // profile) — the §8.r11.2 probe. Verify predicate 10·i ≥ 9·u.
    if (forms("D")) time("D deletion-sig d=2 tau=0.9") {
      val prof = cb.groupBy(col("c"))
        .agg(sort_array(collect_set(col("e"))).as("brands"))
        .localCheckpoint()
      val d1 = prof.select(col("c"), explode(
        concat(array(col("brands")),
          transform(sequence(lit(0), size(col("brands")) - 1),
            i => filter(col("brands"), (_, j) => j =!= i)))).as("sigarr"))
      val d2 = prof.select(col("c"), explode(flatten(
        transform(sequence(lit(0), size(col("brands")) - 2), i =>
          transform(sequence(i + 1, size(col("brands")) - 1), j =>
            filter(col("brands"), (_, p) => p =!= i && p =!= j)))))
        .as("sigarr"))
      val sigs = d1.union(d2)
        .filter(size(col("sigarr")) >= 1)
        .select(col("c"), xxhash64(concat_ws(",", col("sigarr"))).as("sig"))
      val cand = sigs.select(col("sig"), col("c").as("a_id"))
        .join(sigs.select(col("sig"), col("c").as("b_id")), Seq("sig"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
        .distinct()
      cand
        .join(prof.select(col("c").as("a_id"), col("brands").as("a_br")), "a_id")
        .join(prof.select(col("c").as("b_id"), col("brands").as("b_br")), "b_id")
        .select(col("a_id"), col("b_id"),
          size(array_intersect(col("a_br"), col("b_br"))).cast("long").as("i"),
          (size(col("a_br")) + size(col("b_br")) -
            size(array_intersect(col("a_br"), col("b_br")))).cast("long").as("u"))
        .filter(col("i") * 10 >= col("u") * 9)
        .count()
    }

    // E/E1: the §8.r11.1 two-stage verify (collision-bound first,
    // exact array re-verify on survivors only) vs D/A's
    // verify-every-candidate — same profiles, same predicate.
    def prof = cb.groupBy(col("c"))
      .agg(sort_array(collect_set(col("e"))).as("brands"))

    if (forms("E")) time("E hashverify d=2 tau=.9") {
      ops.Bipartite.deletionPairs(prof, 9, 10, 2).count()
    }

    if (forms("E1")) time("E1 hashverify d=1 tau=.95") {
      ops.Bipartite.deletionPairs(prof, 19, 20, 1).count()
    }

    // F/G: cluster end-to-end (pairs → connected components) — the
    // §8.r11.1 consumer — at both parameterizations.
    if (forms("F")) time("F clusters d=2 tau=.9") {
      ops.Llm.connectedComponents(
        ops.Bipartite.deletionPairs(prof, 9, 10, 2).select("a_id", "b_id"))
        .count()
    }

    if (forms("G")) time("G clusters d=1 tau=.95") {
      ops.Llm.connectedComponents(
        ops.Bipartite.deletionPairs(prof, 19, 20, 1).select("a_id", "b_id"))
        .count()
    }

    // H/H2: exact-dup collapse before the join (distinct-profile
    // cardinality in the signature self-join, pairs re-expanded).
    if (forms("H")) time("H collapsed d=1 tau=.95") {
      ops.Bipartite.deletionPairsCollapsed(prof, 19, 20, 1).count()
    }

    if (forms("H2")) time("H2 collapsed d=2 tau=.9") {
      ops.Bipartite.deletionPairsCollapsed(prof, 9, 10, 2).count()
    }

    if (forms("C")) time("C prefix candidates") {
      val base = cb.localCheckpoint()
      val inv = base
        .join(base.groupBy("c").agg(count(lit(1)).as("gsz")), "c")
        .select(col("c").cast("int").as("doc_id"), col("gsz").cast("int"),
          xxhash64(col("e")).as("gh"))
      val dfreq = inv.groupBy("gh").agg(count(lit(1)).as("df"))
      ops.PairJoins.prefixCandidates(inv, dfreq, 20, None).count()
    }

    spark.stop()
  }
}
