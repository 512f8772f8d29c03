package graft

import org.apache.spark.sql.functions._

/** ops.IvfIndex: persisted cell-partitioned ANN index — result parity
  * with the in-memory annIvf, probe-side scan pruning (DPP), a
  * shuffle-free index side, and O(batch) append.
  */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  /** 4 well-separated direction clusters × 30 vectors, 16 dims — the
    * same planted-geometry approach as Llm2Spec's IVF recall test.
    */
  private def clusteredVecs(n: Int = 30): Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(7)
    (0 until 4).flatMap { c =>
      val base = Array.tabulate(16)(i => math.sin((i + 1) * (c + 1) * 0.9))
      (0 until n).map { j =>
        val v = base.map(x => x + rnd.nextGaussian() * 0.05)
        ((c * n + j).toLong, v)
      }
    }
  }

  private def embDf(rows: Seq[(Long, Array[Double])]) =
    rows.toDF("vec_id", "v")

  test("probe against the persisted index returns exactly annIvf's results") {
    val rows = clusteredVecs()
    val emb = embDf(rows)
    ops.IvfIndex.buildIndex(spark, emb, "ivf_parity", nlist = 8)
    try {
      val fromIndex = ops.IvfIndex.probe(spark,
          emb.filter(col("vec_id") < 5).select(col("vec_id").as("p_id"), col("v").as("pv")),
          "ivf_parity", nprobe = 2, k = 3)
        .as[(Long, Int, Long, Double)].collect().toSeq
      val inMemory = ops.Llm2.annIvf(emb, col("vec_id") < 5, nlist = 8, nprobe = 2, k = 3)
        .as[(Long, Int, Long, Double)].collect().toSeq
      assert(fromIndex === inMemory,
        s"persisted-index probe diverged from annIvf:\n$fromIndex\nvs\n$inMemory")
      assert(fromIndex.nonEmpty)
    } finally io.TableManifest.drop(spark, "ivf_parity")
  }

  test("probe prunes the scan to the probed cell directories and never exchanges the index side") {
    val emb = embDf(clusteredVecs())
    ops.IvfIndex.buildIndex(spark, emb, "ivf_plan", nlist = 8)
    try {
      val q = ops.IvfIndex.probe(spark,
        emb.filter(col("vec_id") === 0).select(col("vec_id").as("p_id"), col("v").as("pv")),
        "ivf_plan", nprobe = 2, k = 3)
      q.collect() // finalize the adaptive plan
      val plan = q.queryExecution.executedPlan.toString
      // scan pruning: the probed cell set lands as a static partition
      // filter — the scan lists/reads ≤ nprobe cell directories, not
      // all nlist
      val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
      assert(pf.contains("cell") && pf.contains(" IN "),
        s"index scan must be partition-pruned to the probed cells:\n$plan")
      val scannedDirs = "InMemoryFileIndex\\((\\d+) paths\\)".r
        .findFirstMatchIn(plan).map(_.group(1).toInt)
      assert(scannedDirs.exists(_ <= 2),
        s"nprobe=2 probe must list at most 2 cell directories, got $scannedDirs:\n$plan")
      // the index side never exchanges: the only hashpartitioning
      // exchange in the final plan is the top-k window's (on p_id)
      val finalPlan = plan.split("== Initial Plan ==").head
      val hashExchanges = "Exchange hashpartitioning\\(([a-z_]+)".r
        .findAllMatchIn(finalPlan).map(_.group(1)).toList
      assert(hashExchanges.forall(_ == "p_id"),
        s"index rows must stream shuffle-free to the join, got exchanges on $hashExchanges:\n$plan")
    } finally io.TableManifest.drop(spark, "ivf_plan")
  }

  test("streaming append: micro-batches land in the index, probes see them between triggers") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = clusteredVecs()
    ops.IvfIndex.buildIndex(spark, embDf(rows), "ivf_stream", nlist = 8)
    val ckpt = java.nio.file.Files.createTempDirectory("ivfck").toString
    val v0 = rows.head._2
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Double])]
    val q = ops.IvfIndex.streamAppend(
      stream.toDF().toDF("vec_id", "v"), "ivf_stream", ckpt)
    try {
      stream.addData(Seq((2000L, v0.map(_ * 1.02))))
      q.processAllAvailable()
      val top1 = ops.IvfIndex.probe(spark,
          Seq((0L, v0)).toDF("p_id", "pv"), "ivf_stream", nprobe = 1, k = 1)
        .select("vec_id").as[Long].collect().toSet
      assert(top1 === Set(2000L), s"first batch's near-copy must be probe-visible, got $top1")
      stream.addData(Seq((2001L, v0.map(_ * 0.98))))
      q.processAllAvailable()
      val top2 = ops.IvfIndex.probe(spark,
          Seq((0L, v0)).toDF("p_id", "pv"), "ivf_stream", nprobe = 1, k = 2)
        .select("vec_id").as[Long].collect().toSet
      assert(top2 === Set(2000L, 2001L), s"both batches must be probe-visible, got $top2")
    } finally {
      q.stop()
      io.TableManifest.drop(spark, "ivf_stream")
    }
  }

  test("a replayed micro-batch (at-least-once foreachBatch recovery) appends nothing twice") {
    val rows = clusteredVecs(10)
    ops.IvfIndex.buildIndex(spark, embDf(rows), "ivf_replay", nlist = 4)
    val ckpt = java.nio.file.Files.createTempDirectory("ivfrp").toString
    try {
      def indexCount() = spark.table(
        ops.IvfIndex.resolveTable(spark, "ivf_replay")).count()
      val batch = embDf(Seq((5000L, rows.head._2.map(_ * 1.01))))
      ops.IvfIndex.appendBatch(batch, batchId = 0L, "ivf_replay", ckpt)
      val afterFirst = indexCount()
      // recovery replays the same batchId — the commit marker must
      // make it a no-op, not a duplicate append
      ops.IvfIndex.appendBatch(batch, batchId = 0L, "ivf_replay", ckpt)
      assert(indexCount() === afterFirst,
        "replaying a committed batchId must not duplicate its rows")
      // a NEW batchId still appends
      ops.IvfIndex.appendBatch(
        embDf(Seq((5001L, rows.head._2.map(_ * 0.99)))), batchId = 1L, "ivf_replay", ckpt)
      assert(indexCount() === afterFirst + 1)
    } finally io.TableManifest.drop(spark, "ivf_replay")
  }

  test("compaction collapses append-grown cells to one file each without changing results") {
    val rows = clusteredVecs(10)
    ops.IvfIndex.buildIndex(spark, embDf(rows), "ivf_cmp", nlist = 4)
    try {
      val v0 = rows.head._2
      // three appends → each touched cell dir gains files per append
      for (i <- 0 until 3)
        ops.IvfIndex.appendToIndex(spark,
          embDf(Seq((3000L + i, v0.map(_ * (1.0 + 0.01 * (i + 1)))))), "ivf_cmp")
      // resolve per call: compaction publishes a NEW physical version
      def filesPerCell: Map[String, Int] = new java.io.File(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(
            ops.IvfIndex.resolveTable(spark, "ivf_cmp"))).location).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("cell="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
      val before = ops.IvfIndex.probe(spark,
          Seq((0L, v0)).toDF("p_id", "pv"), "ivf_cmp", nprobe = 2, k = 5)
        .collect().toSeq
      assert(filesPerCell.values.exists(_ > 1), s"appends must have grown files: $filesPerCell")
      ops.IvfIndex.compact(spark, "ivf_cmp")
      assert(filesPerCell.values.forall(_ == 1), s"one file per cell after compaction: $filesPerCell")
      val afterQ = ops.IvfIndex.probe(spark,
        Seq((0L, v0)).toDF("p_id", "pv"), "ivf_cmp", nprobe = 2, k = 5)
      val after = afterQ.collect().toSeq
      assert(after === before, "compaction must not change probe results")
      // the rewrite must also preserve the partitioned layout the
      // probe's static cell pruning depends on
      assert(afterQ.queryExecution.executedPlan.toString
        .contains("PartitionFilters: [cell"),
        "cell pruning must survive compaction")
    } finally io.TableManifest.drop(spark, "ivf_cmp")
  }

  test("append assigns with the stored quantizer; probes see appended vectors; cells stay stable") {
    val rows = clusteredVecs()
    val emb = embDf(rows)
    ops.IvfIndex.buildIndex(spark, emb, "ivf_app", nlist = 8)
    try {
      val cellsBefore = spark.table(ops.IvfIndex.resolveTable(spark, "ivf_app"))
        .select("vec_id", "cell").as[(Long, Int)].collect().toMap
      // new batch: near-copies of vector 0 (same direction, must land
      // in its cell and dominate its neighborhood)
      val v0 = rows.head._2
      val batch = Seq((1000L, v0.map(_ * 1.01)), (1001L, v0.map(_ * 0.99)))
      ops.IvfIndex.appendToIndex(spark, embDf(batch), "ivf_app")
      val after = spark.table(ops.IvfIndex.resolveTable(spark, "ivf_app"))
        .select("vec_id", "cell").as[(Long, Int)].collect().toMap
      // append never moves an existing vector
      cellsBefore.foreach { case (id, cell) =>
        assert(after(id) === cell, s"vec $id changed cell on append")
      }
      assert(after.size === cellsBefore.size + 2)
      assert(after(1000L) === cellsBefore(0L), "near-copy must share vec 0's cell")
      val top = ops.IvfIndex.probe(spark,
          Seq((0L, v0)).toDF("p_id", "pv"), "ivf_app", nprobe = 1, k = 2)
        .select("vec_id").as[Long].collect().toSet
      assert(top === Set(1000L, 1001L),
        s"appended near-copies must top vec 0's neighbor list, got $top")
    } finally io.TableManifest.drop(spark, "ivf_app")
  }
}
