package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round 15: validation of the PROMOTED MinHash-banded dispatch
  * branch inside the two shipped ngram dedup keys (the r14 verdict's
  * item 2). For each corpus above [[ops.PairJoins.BandedPairVolume]]
  * (sf0.3, sf1 — ScratchPairVolume: 1.42·10⁸ / 1.58·10⁹ vs the 10⁸
  * switch), runs the SHIPPED keys (which now take the banded branch)
  * and an inline EXACT reference (the shared-count pipeline the keys
  * use below the switch), then asserts the banded output is a SUBSET
  * of the exact pair set and prints recall. The containment exact
  * reference is skipped where its Σ df² join cannot run (sf1 DNF'd
  * on disk at 50 k docs — the measured negative that motivated the
  * branch); there precision = 1 holds by construction (every emitted
  * pair is exact-verified) and recall is certified at sf0.3.
  *
  * Run: sbt "Test/runMain graft.ScratchNgramPromoted [dirs...]"
  * (defaults /tmp/sf03 /tmp/sf1; pass `nocontain` to skip the
  * containment exact reference everywhere).
  */
object ScratchNgramPromoted {

  def main(args: Array[String]): Unit = {
    val dirs0 = args.filterNot(_ == "nocontain")
    val dirs = if (dirs0.nonEmpty) dirs0.toSeq else Seq("/tmp/sf03", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docsOf(dir: String): DataFrame = {
      val grams = graft.functions.TextExpressions.wordShingles(col("text"), 2)
      graft.io.Readers.table(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), grams.as("grams"))
        .filter(size(col("grams")) > 0)
        .select(col("doc_id"), col("lang"), size(col("grams")).as("gsz"),
          col("grams"))
        .localCheckpoint()
    }

    /** Exact shared-count jaccard pair set (the below-switch branch,
      * inlined so the dispatch cannot reroute it).
      */
    def exactJaccard(d: DataFrame): DataFrame = {
      val inv = d.select(col("doc_id"), col("gsz"),
        explode(col("grams")).as("gram"), col("lang"))
        .select(col("doc_id"), col("gsz"),
          xxhash64(col("lang"), col("gram")).as("gh"))
      val a = inv.select(col("gh"), col("doc_id").as("a_id"), col("gsz").as("a_sz"))
      val b = inv.select(col("gh").as("b_gh"), col("doc_id").as("b_id"),
        col("gsz").as("b_sz")).hint("shuffle_hash")
      val counted = a.join(b,
          col("gh") === col("b_gh") && col("a_id") < col("b_id") &&
          lit(2) * col("a_sz") >= col("b_sz") &&
          lit(2) * col("b_sz") >= col("a_sz"))
        .select(shiftleft(col("a_id").cast("long"), 32)
          .bitwiseOR(col("b_id").cast("long")).as("pk"),
          col("a_sz"), col("b_sz"))
        .groupBy(col("pk"))
        .agg(count(lit(1)).as("shared_h"),
          max(col("a_sz")).as("a_sz"), max(col("b_sz")).as("b_sz"))
        .filter(lit(3) * col("shared_h") >= col("a_sz") + col("b_sz"))
        .select(shiftright(col("pk"), 32).cast("int").as("a_id"),
          col("pk").bitwiseAND(lit(0xFFFFFFFFL)).cast("int").as("b_id"),
          col("a_sz"), col("b_sz"))
      verifyJaccard(counted, d)
    }

    def verifyJaccard(cand: DataFrame, d: DataFrame): DataFrame = cand
      .join(d.select(col("doc_id").as("a_id"), col("lang"),
        col("grams").as("a_grams")), "a_id")
      .join(d.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
        col("grams").as("b_grams")), "b_id")
      .filter(col("lang") === col("b_lang"))
      .withColumn("shared", size(array_intersect(col("a_grams"), col("b_grams"))))
      .filter(lit(2) * col("shared") >=
        col("a_sz") + col("b_sz") - col("shared"))
      .select(col("a_id").cast("long").as("a_id"),
        col("b_id").cast("long").as("b_id"))

    /** Exact shared-count containment pair set (no size-ratio bound). */
    def exactContainment(d: DataFrame): DataFrame = {
      val inv = d.select(col("doc_id"), explode(col("grams")).as("gram"),
        col("lang"))
        .select(col("doc_id"), xxhash64(col("lang"), col("gram")).as("gh"))
      val sizes = d.select(col("doc_id"), col("gsz"))
      val a = inv.select(col("gh"), col("doc_id").as("a_id"))
      val b = inv.select(col("gh").as("b_gh"), col("doc_id").as("b_id"))
        .hint("shuffle_hash")
      val cand = a.join(b, col("gh") === col("b_gh") && col("a_id") < col("b_id"))
        .select(shiftleft(col("a_id").cast("long"), 32)
          .bitwiseOR(col("b_id").cast("long")).as("pk"))
        .groupBy(col("pk"))
        .agg(count(lit(1)).as("shared_h"))
        .select(shiftright(col("pk"), 32).cast("int").as("a_id"),
          col("pk").bitwiseAND(lit(0xFFFFFFFFL)).cast("int").as("b_id"),
          col("shared_h"))
        .join(broadcast(sizes.select(col("doc_id").cast("int").as("a_id"),
          col("gsz").as("a_sz"))), "a_id")
        .join(broadcast(sizes.select(col("doc_id").cast("int").as("b_id"),
          col("gsz").as("b_sz"))), "b_id")
        .filter(lit(5) * col("shared_h") >= lit(4) * least(col("a_sz"), col("b_sz")))
        .select(col("a_id"), col("b_id"))
      cand
        .join(d.select(col("doc_id").as("a_id"), col("lang"),
          col("grams").as("a_grams"), col("gsz").as("a_sz")), "a_id")
        .join(d.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
          col("grams").as("b_grams"), col("gsz").as("b_sz")), "b_id")
        .filter(col("lang") === col("b_lang"))
        .filter(lit(5) * size(array_intersect(col("a_grams"), col("b_grams"))) >=
          lit(4) * least(col("a_sz"), col("b_sz")))
        .select(col("a_id").cast("long").as("a_id"),
          col("b_id").cast("long").as("b_id"))
    }

    def check(name: String, shipped: DataFrame, exact: Option[DataFrame]): Unit = {
      val t0 = System.nanoTime()
      val got = shipped.select(col("a_id").cast("long").as("a_id"),
        col("b_id").cast("long").as("b_id")).localCheckpoint()
      val n = got.count()
      val tS = (System.nanoTime() - t0) / 1e9
      exact match {
        case Some(ex) =>
          val t1 = System.nanoTime()
          val exC = ex.localCheckpoint()
          val m = exC.count()
          val tE = (System.nanoTime() - t1) / 1e9
          val extra = got.join(exC, Seq("a_id", "b_id"), "left_anti").count()
          println(f"[$name] shipped=$n%d ($tS%.1f s)  exact=$m%d ($tE%.1f s)  " +
            f"recall=${n.toDouble / math.max(m, 1)}%.4f  not-in-exact=$extra%d (must be 0)")
        case None =>
          println(f"[$name] shipped=$n%d ($tS%.1f s)  exact=SKIPPED (sf1 DNF)")
      }
    }

    dirs.foreach { dir =>
      println(s"== corpus $dir  pairVolume=${ops.PairJoins.pairVolume(
        ops.PairJoins.bigramDfreq(spark, dir))}")
      val d = docsOf(dir)
      check("jaccard", graft.ops.Llm2.dedupNgramJaccard(spark, dir),
        Some(exactJaccard(d)))
      val contExact =
        if (args.contains("nocontain") || dir.endsWith("sf1")) None
        else Some(exactContainment(d))
      check("containment", graft.ops.Curation.dedupNgramContainment(spark, dir),
        contExact)
    }
    spark.stop()
  }
}
