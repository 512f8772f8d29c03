package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round 18 — the tombstone class exercised AT SCALE with planted
  * chains (pre-executing the §8.r19 item-7 note: the natural corpora
  * barely exercise it — sf0.1 had ONE instance, sf1 zero).
  *
  * Geometry per family (the IncrementalCurationSpec chain-divergence
  * proportions): 60-word docs where A–M and M–B are TRUE near pairs
  * (bigram J ≈ 0.64 ≥ τ = 0.5) but A–B is NOT (J ≈ 0.40). All three
  * arrive in ONE batch: when both edges are estimator-visible the
  * within-batch closure is {A, M, B} → A admits, M and B drop — and
  * NOTHING B-shaped is in the band index (only A is). A later batch
  * presents B′, an EXACT duplicate of B: before tombstones it
  * admitted (its hash was never indexed; its only true partner M is
  * not in the index — the chain-through-dropped-docs leak); with
  * tombstones it must hit B's hash row (keeper = the component root)
  * and read `drop_exact_index`. Edge visibility is per-family
  * deterministic (engine-seeded hashes), so the class count is a
  * fixed property of the plant — the scratch requires it to be
  * substantial and the leak count to be ZERO.
  *
  * Run: sbt "Test/runMain graft.ScratchPlantedChains [nFamilies nFiller]".
  */
object ScratchPlantedChains {

  def main(args: Array[String]): Unit = {
    val nFam = args.headOption.map(_.toInt).getOrElse(500)
    val nFiller = args.drop(1).headOption.map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-pc").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the spec's chain geometry, parameterized by family tag
    def base(f: Int) = Seq("the", "of") ++ (1 to 58).map(i => s"pc${f}x$i")
    def swap(ws: Seq[String], f: Int, from: Int, to: Int, m: String) =
      ws.zipWithIndex.map { case (w, i) =>
        if (i >= from && i <= to) s"pc$f$m$i" else w }
    def chA(f: Int) = base(f).mkString(" ")
    def chM(f: Int) = swap(base(f), f, 40, 51, "m").mkString(" ")
    def chB(f: Int) = swap(swap(base(f), f, 40, 51, "m"), f, 28, 39, "b")
      .mkString(" ")
    def filler(i: Int) =
      (Seq("the", "of") ++ (1 to 18).map(j => s"fl${i}x$j")).mkString(" ")

    def docs(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, "en", t) }.toDF("doc_id", "lang", "text")

    // ids: family f → A = 10f, M = 10f+1, B = 10f+2, B′ = 10f+5
    val fams = (1 to nFam).toSeq
    val batch1 = docs(fams.flatMap(f => Seq(
        (10L * f) -> chA(f), (10L * f + 1) -> chM(f), (10L * f + 2) -> chB(f))) ++
      (1 to nFiller / 2).map(i => (1000000L + i) -> filler(i)))
    val batch2 = docs(
      (1 to nFiller / 2).map(i => (2000000L + i) -> filler(nFiller / 2 + i)))
    val batch3 = docs(fams.map(f => (10L * f + 5) -> chB(f))) // B′ = exact dup of B

    ops.IncrementalCuration.buildHashIndex(
      docs(Seq(1L -> filler(9999991))), "pc_hash")
    ops.IncrementalDedup.buildIndex(
      docs(Seq(1L -> filler(9999991))), "pc_band")

    var store = docs(Seq(1L -> filler(9999991))).localCheckpoint()
    var ledger = Map.empty[Long, String]
    Seq(batch1, batch2, batch3).zipWithIndex.foreach { case (b, i) =>
      val t0 = System.nanoTime()
      val led = ops.IncrementalCuration.curateBatch(
          b, "pc_hash", "pc_band", verifyCorpus = Some(store))
        .select(col("doc_id").cast("long"), col("status"))
        .as[(Long, String)].collect().toMap
      ledger ++= led
      val adm = led.filter(_._2 == "admitted").keySet
      if (adm.nonEmpty)
        store = store.unionByName(
          b.filter(col("doc_id").isInCollection(adm))).localCheckpoint()
      println(f"batch ${i + 1}: ${led.size}%6d docs, " +
        f"${adm.size}%6d admitted, ${(System.nanoTime() - t0) / 1e9}%6.1f s")
    }

    // per-family adjudication
    var classInstances = 0 // B near-dropped purely in-batch (the leak shape)
    var leaked = 0         // its B′ admitted anyway
    val histo = scala.collection.mutable.Map.empty[String, Int]
    fams.foreach { f =>
      val bSt = ledger(10L * f + 2)
      val bpSt = ledger(10L * f + 5)
      histo(s"B=$bSt") = histo.getOrElse(s"B=$bSt", 0) + 1
      histo(s"B'=$bpSt") = histo.getOrElse(s"B'=$bpSt", 0) + 1
      if (bSt == "drop_near_batch") {
        classInstances += 1
        if (bpSt == "admitted") leaked += 1
      }
    }
    println(s"families $nFam, class instances (B drop_near_batch) " +
      s"$classInstances, leaked B' $leaked")
    histo.toSeq.sorted.foreach { case (k, v) => println(f"  $k%-25s $v%5d") }
    require(classInstances >= nFam / 10,
      s"the plant must produce a substantial class: $classInstances")
    require(leaked == 0,
      s"tombstones must close the planted re-entry class: $leaked leaks")
    // every class instance's B′ must be an exact-tier tombstone hit
    val wrong = fams.filter(f => ledger(10L * f + 2) == "drop_near_batch" &&
      ledger(10L * f + 5) != "drop_exact_index")
    require(wrong.isEmpty, s"class B' must hit the tombstone: $wrong")
    spark.stop()
  }
}
