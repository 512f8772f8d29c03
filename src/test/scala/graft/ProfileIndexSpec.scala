package graft

import org.apache.spark.sql.functions._

/** ops.ProfileIndex: persisted deletion-signature index — probe
  * correctness vs brute force, shuffle-free index side, append
  * growth. Mirrors IncrementalDedupSpec's structure on the profile
  * domain.
  */
class ProfileIndexSpec extends SparkSpec {
  import spark.implicits._

  private val universe = ('a' to 'y').map(_.toString) // 25 brands

  private def profDf(rows: Seq[(Long, Seq[String])]) =
    rows.toDF("c", "brands").select(col("c"), sort_array(col("brands")).as("brands"))

  private def bruteMatches(corpus: Seq[(Long, Seq[String])],
      batch: Seq[(Long, Seq[String])], p: Int, q: Int): Set[(Long, Long, Long, Long)] =
    (for {
      (n, nb) <- batch; (x, xb) <- corpus if n != x
      i = (nb.toSet & xb.toSet).size.toLong
      u = (nb.toSet | xb.toSet).size.toLong
      if i * q >= u * p
    } yield (n, x, i, u)).toSet

  test("probe + verifyExact equal brute force; novel profiles pass clean") {
    val corpus: Seq[(Long, Seq[String])] = Seq(
      1L -> universe,
      2L -> universe.drop(1),
      3L -> universe.take(10),
      4L -> Seq("q"))
    val idx = profDf(corpus)
    ops.ProfileIndex.buildIndex(idx, "pidx_m")
    try {
      val batch: Seq[(Long, Seq[String])] = Seq(
        10L -> universe,                        // equal to 1, Δ=1 to 2
        11L -> (universe.drop(1) :+ "z").sorted, // Δ=1 to 2, Δ=2 to 1
        12L -> Seq("q"),                        // identical singleton to 4
        13L -> Seq("m", "n", "o"))              // novel
      val nb = profDf(batch)
      val cands = ops.ProfileIndex.probe(spark, nb, "pidx_m", 19, 20)
      val got = ops.ProfileIndex.verifyExact(cands, nb, idx, 19, 20)
        .select("new_id", "indexed_id", "inter", "uni")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === bruteMatches(corpus, batch, 19, 20))
      assert(got.contains((10L, 1L, 25L, 25L)))
      assert(got.contains((12L, 4L, 1L, 1L))) // singleton full-sig kept
      assert(!got.exists(_._1 == 13L))
      // stage 1 alone already contains every brute-force pair (bound
      // completeness), with exact i for in-envelope pairs
      val s1 = cands.select("new_id", "indexed_id", "inter_lb", "uni_ub")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(bruteMatches(corpus, batch, 19, 20).subsetOf(s1))
    } finally io.TableManifest.drop(spark, "pidx_m")
  }

  test("index side joins without a shuffle (bucketed layout IS the join layout)") {
    val corpus = (1L to 400L).map(i =>
      i -> universe.take(5 + (i % 20).toInt))
    ops.ProfileIndex.buildIndex(profDf(corpus), "pidx_plan")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val batch = profDf(Seq(900L -> universe.take(24)))
      val q = ops.ProfileIndex.probe(spark, batch, "pidx_plan", 19, 20)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"index scan must be bucketed:\n$plan")
      val finalPlan = plan.split("== Initial Plan ==").head
      val sigExchanges = "Exchange hashpartitioning\\(sig".r.findAllIn(finalPlan).length
      assert(sigExchanges == 1,
        s"expected exactly the new side to exchange on sig, got $sigExchanges:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      io.TableManifest.drop(spark, "pidx_plan")
    }
  }

  test("compactDedup reclaims replay-duplicated rows; probe unchanged") {
    val corpus: Seq[(Long, Seq[String])] = Seq(
      1L -> universe, 2L -> universe.drop(1), 3L -> universe.take(10))
    ops.ProfileIndex.buildIndex(profDf(corpus), "pidx_dd")
    try {
      def rows() = spark.table(
        ops.ProfileIndex.resolveTable(spark, "pidx_dd")).count()
      val clean = rows()
      // a crash replay re-appends the same batch verbatim
      ops.ProfileIndex.appendToIndex(profDf(corpus), "pidx_dd")
      assert(rows() === clean * 2)
      def probe() = ops.ProfileIndex.probe(spark,
        profDf(Seq(10L -> universe)), "pidx_dd", 19, 20)
        .select("new_id", "indexed_id").as[(Long, Long)].collect().toSet
      val before = probe()
      assert(before === Set((10L, 1L), (10L, 2L)))
      ops.ProfileIndex.compactDedup(spark, "pidx_dd")
      assert(rows() === clean, "distinct compaction must reclaim the duplicates")
      assert(probe() === before, "probe semantics must survive the rewrite")
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(
          ops.ProfileIndex.resolveTable(spark, "pidx_dd")))
      assert(meta.bucketSpec.exists(s =>
        s.numBuckets == 8 && s.bucketColumnNames == Seq("sig")),
        s"bucket spec must survive: ${meta.bucketSpec}")
    } finally io.TableManifest.drop(spark, "pidx_dd")
  }

  test("append grows the index without rewriting; probes match appended profiles") {
    ops.ProfileIndex.buildIndex(profDf(Seq(1L -> universe.take(12))), "pidx_app")
    try {
      def files(): Set[String] = {
        val loc = spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(
            ops.ProfileIndex.resolveTable(spark, "pidx_app"))).location
        new java.io.File(loc).listFiles()
          .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
      }
      val before = files()
      ops.ProfileIndex.appendToIndex(profDf(Seq(20L -> universe)), "pidx_app")
      assert(before.subsetOf(files()), "append must keep the original files")
      assert(files().size > before.size, "append must add files")
      val m = ops.ProfileIndex.probe(spark,
        profDf(Seq(30L -> universe.drop(1))), "pidx_app", 19, 20)
        .select("new_id", "indexed_id").as[(Long, Long)].collect().toSet
      assert(m === Set((30L, 20L)), s"got $m")
    } finally io.TableManifest.drop(spark, "pidx_app")
  }
}
