package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §8.r16 / r15 verdict item 2 measurement: the substring-span
  * family's spine swap and join-key dispatch at scale.
  *
  * Three forms of the same detector over the sf1 corpus (50 k docs):
  *   (a) OLD  — the r6–r15 positional 3-gram string join, run ≥ 2;
  *   (b) NEW  — the shipped 4-gram string join (run ≥ 1 ≡ span ≥ 4);
  *   (c) HASH — the shipped hashed branch (xxhash64 key + whole-span
  *              slice re-verify), forced regardless of the probe.
  * Asserts all three emit the IDENTICAL span set, prints wall-clocks
  * and the probe scalars (which branch the shipped dispatch takes).
  *
  * Run: sbt "Test/runMain graft.ScratchSpanSpine [dir]".
  */
object ScratchSpanSpine {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val (sumDf, vol) = ops.PairJoins.quadgramProfile(spark, dir)
    println(f"probe: sumDf=$sumDf%.3e pairVolume=$vol%.3e " +
      f"shippedBranch=${if (vol > ops.PairJoins.BandedPairVolume) "hashed" else "exact"}")

    def d4 = graft.io.Readers.table(spark, dir, "documents")
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"), col("lang"), split(trim(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 4)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // (a) the r15 3-gram form, verbatim
    def oldForm = {
      val toks = split(trim(col("text")), "\\s+")
      val d = graft.io.Readers.table(spark, dir, "documents")
        .filter(trim(col("text")) =!= "")
        .select(col("doc_id"), col("lang"), toks.as("toks"))
        .filter(size(col("toks")) >= 3)
      val g = d.select(col("doc_id"), col("lang"),
          explode(transform(sequence(lit(0), size(col("toks")) - 3),
            i => struct(i.as("pos"),
              concat_ws(" ", slice(col("toks"), i + 1, lit(3))).as("gram")))).as("pg"))
        .select(col("doc_id"), col("lang"), col("pg.pos").as("pos"), col("pg.gram").as("gram"))
      val b = g.select(col("lang").as("b_lang"), col("gram").as("b_gram"),
        col("doc_id").as("b_id"), col("pos").as("b_pos")).hint("shuffle_hash")
      val pairs = g.join(b,
          col("lang") === col("b_lang") && col("gram") === col("b_gram") &&
            col("doc_id") < col("b_id"))
        .select(col("lang"), col("doc_id").as("a_id"), col("b_id"),
          col("pos").as("a_pos"), (col("pos") - col("b_pos")).as("diag"))
      val wi = Window.partitionBy(col("a_id"), col("b_id"), col("diag"))
        .orderBy(col("a_pos"))
      pairs.withColumn("isl", col("a_pos") - row_number().over(wi))
        .groupBy(col("lang"), col("a_id"), col("b_id"), col("diag"), col("isl"))
        .agg(min(col("a_pos")).as("a_start"), count(lit(1)).as("run"))
        .filter(col("run") >= 2)
        .select(col("lang"), col("a_id"), col("b_id"), col("a_start"),
          (col("a_start") - col("diag")).as("b_start"),
          (col("run") + 2).as("span_toks"))
    }

    def collectSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("lang"), col("a_id").cast("long"), col("b_id").cast("long"),
        col("a_start").cast("int"), col("b_start").cast("int"),
        col("span_toks").cast("long"))
      .as[(String, Long, Long, Int, Int, Long)].collect().toSet

    // steady-state: run each twice, report the second
    var oldSet: Set[(String, Long, Long, Int, Int, Long)] = Set.empty
    var newSet: Set[(String, Long, Long, Int, Int, Long)] = Set.empty
    var hashSet: Set[(String, Long, Long, Int, Int, Long)] = Set.empty
    (1 to 2).foreach { rep =>
      oldSet = timed(s"old-3gram rep$rep")(collectSet(oldForm))
      newSet = timed(s"new-4gram rep$rep")(
        collectSet(ops.Curation2.sharedSpans(d4, hashed = false)))
      hashSet = timed(s"hashed rep$rep")(
        collectSet(ops.Curation2.sharedSpans(d4, hashed = true)))
    }
    println(s"spans: old=${oldSet.size} new=${newSet.size} hash=${hashSet.size}")
    require(oldSet == newSet, "4-gram spine must replay the 3-gram form")
    require(newSet == hashSet, "hashed branch must equal the exact branch")
    println("EQUAL: all three forms emit the identical span set")

    // novelty: string key vs hash key, both forced
    val docs = graft.io.Readers.table(spark, dir, "documents")
    def novSet(hashKey: Boolean) = ops.Curation2.noveltyOf(docs, hashKey)
      .as[(Long, Long, Long, Double)].collect().toSet
    var nStr: Set[(Long, Long, Long, Double)] = Set.empty
    var nHsh: Set[(Long, Long, Long, Double)] = Set.empty
    (1 to 2).foreach { rep =>
      nStr = timed(s"novelty-string rep$rep")(novSet(false))
      nHsh = timed(s"novelty-hash rep$rep")(novSet(true))
    }
    require(nStr == nHsh, "novelty hash form must equal the string form")
    println(s"novelty rows=${nStr.size} EQUAL")

    // clean wall-clocks: count()-based (no driver collect in the
    // timed region), 3 reps each, report all
    def clock(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label: ${ts.map(t => f"${t._1}%.2f").mkString("/")} s (rows ${ts.head._2})")
    }
    clock("count old-3gram")(oldForm.count())
    clock("count new-4gram")(ops.Curation2.sharedSpans(d4, hashed = false).count())
    clock("count hashed")(ops.Curation2.sharedSpans(d4, hashed = true).count())
    clock("count novelty-str")(ops.Curation2.noveltyOf(docs, false).count())
    clock("count novelty-hash")(ops.Curation2.noveltyOf(docs, true).count())
    spark.stop()
  }
}
