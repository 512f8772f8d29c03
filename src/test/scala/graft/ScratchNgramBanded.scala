package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** §8.r15 item 3 measured early (round 14): can a MinHash-LSH
  * front-end bound the ngram set-similarity pair volume on the
  * DENSE-UNIFORM vocabulary where the exact Σ df² join was measured
  * corpus-quadratic (containment DNF at sf1, BASELINE.md r14 scaling
  * row)?
  *
  * A = the SHIPPED exact key (`Llm2.dedupNgramJaccard`, τ = 0.5
  * token-bigram Jaccard, lang-blocked, adaptive shared-count/prefix
  * shape). B = MinHash-LSH front-end: 24 seeded minhashes over the
  * SAME bigram sets → 12 bands × 2 rows (theory: P[collide | J=0.5]
  * = 1−(1−0.5²)¹² = 0.968) → lang-blocked band equi-join →
  * exact-verify survivors with the integer τ form. B's output is a
  * SUBSET of A's by construction (every emitted pair is exact-
  * verified), so recall = |B| / |A|.
  *
  * Usage: `sbt "Test/runMain graft.ScratchNgramBanded [dir1 dir2 ...]
  * [exact|noexact]"` — defaults to sf0.1 and /tmp/sf03 with exact
  * comparison; pass `/tmp/sf1 noexact` to time the banded path alone
  * at a scale where the exact join needs tens of GB of shuffle.
  */
object ScratchNgramBanded {

  def main(args: Array[String]): Unit = {
    val dirs0 = args.filterNot(a => a == "exact" || a == "noexact")
    val dirs = if (dirs0.nonEmpty) dirs0.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf03")
    val runExact = !args.contains("noexact")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def bandedPairs(dir: String) = {
      val nPerm = 24; val bands = 12; val rpb = nPerm / bands
      val docs = graft.io.Readers.table(spark, dir, "documents")
        .select(col("doc_id"), col("lang"),
          graft.functions.TextExpressions.wordShingles(col("text"), 2).as("grams"))
        .filter(size(col("grams")) > 0)
        .localCheckpoint()
      val sigs = docs.select(col("doc_id"), col("lang"),
        graft.functions.TextExpressions.minHashSigs(col("grams"), nPerm).as("sig"))
      val bandCols = (0 until bands).map { b =>
        struct(lit(b).as("band"),
          hash((b * rpb until (b + 1) * rpb)
            .map(i => element_at(col("sig"), i + 1)): _*).as("bh")).as(s"b$b")
      }
      val banded = sigs.select(col("doc_id"), col("lang"),
          explode(array(bandCols: _*)).as("e"))
        .select(col("doc_id"), col("lang"), col("e.band").as("band"),
          col("e.bh").as("bh"))
        .localCheckpoint()
      val cand = banded.as("a").join(banded.as("b"),
          col("a.lang") === col("b.lang") && col("a.band") === col("b.band") &&
          col("a.bh") === col("b.bh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      val g = docs.select(col("doc_id"), col("grams"))
      (cand
        .join(g.select(col("doc_id").as("a_id"), col("grams").as("a_g")), "a_id")
        .join(g.select(col("doc_id").as("b_id"), col("grams").as("b_g")), "b_id")
        .withColumn("inter", size(array_intersect(col("a_g"), col("b_g"))))
        .withColumn("uni",
          size(col("a_g")) + size(col("b_g")) - col("inter"))
        .filter(lit(2) * col("inter") >= col("uni"))
        .select(col("a_id"), col("b_id")), cand)
    }

    dirs.foreach { dir =>
      println(s"== corpus $dir")
      val t1 = System.nanoTime()
      val (bp, cand) = bandedPairs(dir)
      val bCount = bp.count()
      val tB = (System.nanoTime() - t1) / 1e9
      val candCount = cand.count()
      println(f"[banded]  pairs=$bCount%d candidates=$candCount%d  $tB%.1f s")
      if (runExact) {
        val t0 = System.nanoTime()
        val exact = graft.ops.Llm2.dedupNgramJaccard(spark, dir)
          .select(col("a_id"), col("b_id"))
        val aCount = exact.count()
        val tA = (System.nanoTime() - t0) / 1e9
        // B ⊆ A by construction; recall is a plain count ratio, but
        // assert the subset relation instead of assuming it
        val extra = bp.join(exact, Seq("a_id", "b_id"), "left_anti").count()
        println(f"[exact]   pairs=$aCount%d  $tA%.1f s")
        println(f"[recall]  ${bCount.toDouble / aCount}%.4f  (banded-not-exact rows: $extra%d — must be 0)")
      }
    }
    spark.stop()
  }
}
