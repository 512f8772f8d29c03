package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round 16 — incremental-curation scale measurement: delta-batch
  * admission cost against a standing sf1-sized index (50 k docs),
  * vs the batch composite's full-corpus pass (~17.5 s at sf1,
  * BASELINE r16 row). The claim under test is O(batch): admission
  * cost tracks the batch, not the corpus.
  *
  * Run: sbt "Test/runMain graft.ScratchIncCuration [dir]".
  */
object ScratchIncCuration {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-inc").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus = graft.io.Readers.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    timed("build hash index (one-time, corpus pass)") {
      ops.IncrementalCuration.buildHashIndex(corpus, "sc_hash")
    }
    timed("build band index (one-time, corpus pass)") {
      ops.IncrementalDedup.buildIndex(corpus, "sc_band")
    }

    // delta: 250 verbatim copies of corpus texts (exact dups) + 250
    // fresh gopher-passing docs over a disjoint vocabulary
    val copies = corpus.filter(col("doc_id") < 250)
      .select((col("doc_id") + 9000000L).as("doc_id"), col("lang"), col("text"))
    val fresh = (0 until 250).map { i =>
      (9100000L + i, "en",
        (Seq("the", "of") ++ (1 to 18).map(j => s"fresh${i}w$j")).mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val batch = copies.unionByName(fresh).localCheckpoint()
    println(s"batch size: ${batch.count()}")

    val led1 = timed("curateBatch (500-doc delta vs 50k-doc index)") {
      ops.IncrementalCuration.curateBatch(batch, "sc_hash", "sc_band")
        .groupBy("status").count().as[(String, Long)].collect().toMap
    }
    println(s"ledger 1: $led1")
    require(led1.getOrElse("admitted", 0L) == 250L, "all fresh docs admit")
    require(!led1.contains("drop_near_index") || led1("drop_near_index") == 0L)
    require(led1.getOrElse("drop_exact_index", 0L) +
      led1.getOrElse("drop_quality", 0L) == 250L,
      "every copy drops at quality or the exact probe")

    val led2 = timed("curateBatch re-presentation (idempotent read)") {
      ops.IncrementalCuration.curateBatch(batch, "sc_hash", "sc_band")
        .groupBy("status").count().as[(String, Long)].collect().toMap
    }
    println(s"ledger 2: $led2")
    require(led2.getOrElse("readmitted", 0L) == 250L, "re-presentation is a no-op")

    // round 17: the VERIFIED path at index scale — a second delta
    // (fresh tags + a different copy slice) admitted with the full
    // corpus as the verify store. The claim under test: verification
    // adds ~one map-only semi-reduced store pass, not a corpus-sized
    // shuffle — admission stays O(batch).
    val copies2 = corpus.filter(col("doc_id") >= 250 && col("doc_id") < 500)
      .select((col("doc_id") + 9200000L).as("doc_id"), col("lang"), col("text"))
    val fresh2 = (0 until 250).map { i =>
      (9300000L + i, "en",
        (Seq("the", "of") ++ (1 to 18).map(j => s"vf${i}w$j")).mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val batch2 = copies2.unionByName(fresh2).localCheckpoint()
    val led3 = timed("curateBatch VERIFIED (500-doc delta, 50k-doc verify store)") {
      ops.IncrementalCuration.curateBatch(batch2, "sc_hash", "sc_band",
          verifyCorpus = Some(corpus))
        .groupBy("status").count().as[(String, Long)].collect().toMap
    }
    println(s"ledger 3: $led3")
    require(led3.getOrElse("admitted", 0L) == 250L, "all fresh docs admit verified")
    require(led3.getOrElse("drop_exact_index", 0L) +
      led3.getOrElse("drop_quality", 0L) == 250L,
      "every copy drops at quality or the exact probe")

    // warm UNVERIFIED control on a third equally-shaped delta — the
    // number led3 compares against (led1 pays first-run JIT)
    val copies3 = corpus.filter(col("doc_id") >= 500 && col("doc_id") < 750)
      .select((col("doc_id") + 9400000L).as("doc_id"), col("lang"), col("text"))
    val fresh3 = (0 until 250).map { i =>
      (9500000L + i, "en",
        (Seq("the", "of") ++ (1 to 18).map(j => s"uf${i}w$j")).mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val batch3 = copies3.unionByName(fresh3).localCheckpoint()
    val led4 = timed("curateBatch unverified warm control (500-doc delta)") {
      ops.IncrementalCuration.curateBatch(batch3, "sc_hash", "sc_band")
        .groupBy("status").count().as[(String, Long)].collect().toMap
    }
    println(s"ledger 4: $led4")
    require(led4.getOrElse("admitted", 0L) == 250L, "all fresh docs admit")

    // round 17: the layout-v2 O(touched) claim on a SMALL delta — a
    // 500-doc batch's hashes cover most of the 256 hp/bp directories
    // (pruning saves little), but a 10-doc trickle touches ≤ 10 hash
    // and ≤ 40 band directories; compare admission + re-presentation
    // against the v1 whole-index-read pair at the same corpus scale.
    timed("build hash index v2 (one-time, partitioned)") {
      ops.IncrementalCuration.buildHashIndexPartitioned(corpus, "sc_hash2")
    }
    timed("build band index v2 (one-time, partitioned)") {
      ops.IncrementalDedup.buildIndexPartitioned(corpus, "sc_band2")
    }
    def small(base: Long, tag: String) = (0 until 10).map { i =>
      (base + i, "en",
        (Seq("the", "of") ++ (1 to 18).map(j => s"$tag${i}w$j")).mkString(" "))
    }.toDF("doc_id", "lang", "text").localCheckpoint()
    val sm1 = small(9600000L, "sma")
    val sm2 = small(9700000L, "smb")
    val led5 = timed("curateBatch 10-doc delta, v1 layouts (whole-index reads)") {
      ops.IncrementalCuration.curateBatch(sm1, "sc_hash", "sc_band")
        .groupBy("status").count().as[(String, Long)].collect().toMap
    }
    require(led5.getOrElse("admitted", 0L) == 10L, s"v1 small delta: $led5")
    val led6 = timed("curateBatch 10-doc delta, v2 layouts (directory-pruned)") {
      ops.IncrementalCuration.curateBatch(sm2, "sc_hash2", "sc_band2")
        .groupBy("status").count().as[(String, Long)].collect().toMap
    }
    require(led6.getOrElse("admitted", 0L) == 10L, s"v2 small delta: $led6")
    val led7 = timed("re-presentation 10-doc delta, v1 (pure probe read)") {
      ops.IncrementalCuration.curateBatch(sm1, "sc_hash", "sc_band")
        .groupBy("status").count().as[(String, Long)].collect().toMap
    }
    require(led7.getOrElse("readmitted", 0L) == 10L, s"v1 re-present: $led7")
    val led8 = timed("re-presentation 10-doc delta, v2 (pure probe read)") {
      ops.IncrementalCuration.curateBatch(sm2, "sc_hash2", "sc_band2")
        .groupBy("status").count().as[(String, Long)].collect().toMap
    }
    require(led8.getOrElse("readmitted", 0L) == 10L, s"v2 re-present: $led8")
    spark.stop()
  }
}
