package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round 17 — the batch ≡ incremental reconciliation at 10× the spec
  * corpus (CurationPipelineSpec pins it at sf0.01; this measures it at
  * sf0.1): the same corpus through [[ops.CurationPipeline.stages]]
  * (stages 1–3) and through verified [[ops.IncrementalCuration
  * .curateBatch]] deltas must agree EXACTLY on quality and exact and
  * may only over-keep on the near stage. Also reports wall-clocks —
  * the one-shot chain vs the incremental bootstrap cost.
  *
  * Run: sbt "Test/runMain graft.ScratchReconcile [dir]".
  */
object ScratchReconcile {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-rec").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select(col("doc_id").cast("long")).as[Long].collect().toSet

    val (quality, exact, neardup) = timed("composite stages 1-3 (full chain runs)") {
      val st = ops.CurationPipeline.stages(spark, dir)
      (ids(st.quality), ids(st.exact), ids(st.neardup))
    }
    val corpus = graft.io.Readers.table(spark, dir, "documents")
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"), col("lang"), col("text"))
    val raw = ids(corpus)
    println(s"corpus: raw ${raw.size} quality ${quality.size} " +
      s"exact ${exact.size} neardup ${neardup.size}")

    val seed = Seq((-1L, "en",
        (Seq("the", "of") ++ (1 to 18).map(i => s"recseed$i")).mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val allIds = corpus.select(col("doc_id").cast("long")).as[Long]
      .collect().sorted

    def run(nBatches: Int, tag: String): Unit = {
      ops.IncrementalCuration.buildHashIndex(seed, s"rc${tag}_hash")
      ops.IncrementalDedup.buildIndex(seed, s"rc${tag}_band")
      var store = seed.localCheckpoint()
      var ledger = Map.empty[Long, String]
      timed(s"incremental $nBatches-batch verified admission (total)") {
        allIds.grouped(math.ceil(allIds.length.toDouble / nBatches).toInt)
          .foreach { chunk =>
            val batch = corpus.filter(
              col("doc_id").between(chunk.head, chunk.last))
            val led = ops.IncrementalCuration.curateBatch(
                batch, s"rc${tag}_hash", s"rc${tag}_band",
                verifyCorpus = Some(store))
              .select(col("doc_id").cast("long"), col("status"))
              .as[(Long, String)].collect().toMap
            ledger ++= led
            val adm = led.filter(_._2 == "admitted").keySet
            if (adm.nonEmpty)
              store = store.unionByName(
                batch.filter(col("doc_id").isInCollection(adm)))
                .localCheckpoint()
          }
      }
      val dq = ledger.filter(_._2 == "drop_quality").keySet
      val de = ledger.filter(kv =>
        kv._2 == "drop_exact_index" || kv._2 == "drop_exact_batch").keySet
      val admitted = ledger.filter(_._2 == "admitted").keySet
      val extras = admitted -- neardup
      // round 18 (near-drop hash tombstones): the
      // exact-dup-of-near-dropped re-entry class this scratch found
      // in round 17 (1 doc at 10-batch sf0.1) is CLOSED — dropped
      // docs tombstone their hash to the cluster keeper, so
      // extrasExact must be EMPTY; the remaining extras are the
      // documented NEAR-type single-link residue (in exact \ neardup).
      val extrasNear = extras.intersect(exact -- neardup)
      val extrasExact = extras -- exact
      val keeperOf: Map[Long, Long] = {
        val norm = corpus
          .join(spark.createDataset(quality.toSeq).toDF("doc_id"), "doc_id")
          .select(col("doc_id").cast("long"),
            lower(regexp_replace(trim(col("text")), "\\s+", " ")).as("n"))
          .as[(Long, String)].collect()
        val mins = norm.groupBy(_._2).map { case (n, rs) => n -> rs.map(_._1).min }
        norm.map { case (id, n) => id -> mins(n) }.toMap
      }
      println(s"$nBatches-batch: quality-agree ${dq == raw -- quality} " +
        s"exact-drops-contained ${de.subsetOf(quality -- exact)} " +
        s"over-drop ${(neardup -- admitted).size} " +
        s"over-keep ${extras.size} (near-type ${extrasNear.size}, " +
        s"exact-dup-of-near-dropped ${extrasExact.size})")
      require(dq == raw -- quality, "quality stage must agree exactly")
      require(de.subsetOf(quality -- exact),
        "incremental exact drops must be composite exact drops")
      require((neardup -- admitted).isEmpty, "must never over-drop")
      require(extras.subsetOf(quality -- neardup),
        "every extra passed quality and is a composite near/exact drop")
      require(extrasExact.isEmpty, "tombstones must close the " +
        s"exact-dup-of-near-dropped re-entry class: $extrasExact " +
        s"(keepers ${extrasExact.map(keeperOf)})")
    }
    run(1, "one")
    run(10, "ten")
    spark.stop()
  }
}
