package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.NumericExpressions.log2Fixed

/** Scratch: the entropy + graph-loop scale fixture (r9 verdict item
  * 6, pattern of ScratchQuantileScale). Two subjects at ~10⁸-row
  * scale with per-task maxima from the task-metrics listener:
  *
  *  1. `textEntropyExact`'s ONE-EXCHANGE shape (repartition(doc_id)
  *     then both aggregations) over 10⁸ generated (doc_id, tok)
  *     rows with a planted 10⁷-token MEGA-DOC — the shape's
  *     documented trade is losing map-side combine, so the mega-doc
  *     rides one partition: the listener shows exactly that
  *     per-task max (expected share + mega-doc), which is the
  *     boundary where the sibling keys' combine-first shape wins.
  *  2. `Llm.connectedComponents` (through Iterate.untilFixpoint) over
  *     3·10⁷ edges: random small clusters + a planted 10⁶-node PATH
  *     — the adversarial diameter case the large-star/small-star
  *     rounds must halve per round.
  *
  * Run: `sbt "Test/runMain graft.ScratchEntropyScale [nTok] [nEdge]"`.
  */
object ScratchEntropyScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.driver.memory", "96g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nTok = args.headOption.map(_.toLong).getOrElse(100000000L)
    val nEdge = args.drop(1).headOption.map(_.toLong).getOrElse(30000000L)
    val megaDoc = nTok / 10 // 10% of tokens in ONE document
    val nDocs = 2000000L
    val vocab = 50000L

    val stageMax = new ConcurrentHashMap[Int, AtomicLong]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val recs = math.max(m.inputMetrics.recordsRead,
            m.shuffleReadMetrics.recordsRead)
          stageMax.computeIfAbsent(te.stageId, _ => new AtomicLong(0))
            .getAndUpdate(prev => math.max(prev, recs))
        }
      }
    })

    def report(label: String): Unit = {
      val worst = stageMax.entrySet().toArray
        .map(_.asInstanceOf[java.util.Map.Entry[Int, AtomicLong]])
        .map(e => (e.getKey, e.getValue.get())).sortBy(-_._2).take(3)
      println(s"$label worst-stage per-task max records: " +
        worst.map { case (s, r) => s"stage$s=$r" }.mkString(", "))
      stageMax.clear()
    }

    // ---- subject 1: one-exchange entropy over 10^8 tokens ----------
    // rows 0..megaDoc-1 → doc 0 (the planted hotspot); the rest spread
    // hash-uniform over nDocs docs; tokens Zipf-flavored by squaring a
    // hash-uniform so low token ids are hot
    val toks = spark.range(0, nTok, 1, 64)
      .select(
        when(col("id") < megaDoc, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(nDocs))).as("doc_id"),
        pmod(xxhash64(col("id"), lit(1)), lit(vocab))
          .multiply(pmod(xxhash64(col("id"), lit(1)), lit(vocab)))
          .divide(lit(vocab)).cast("long").as("tok"))

    def entropyOver(base: org.apache.spark.sql.DataFrame) = base
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("cnt") * log2Fixed(col("cnt"))).as("scl"))
      .withColumn("h20",
        log2Fixed(col("n_tokens")) - expr("scl div n_tokens"))
      .agg(count(lit(1)), sum(col("h20")))

    // shape A: the shipped one-exchange form (repartition(doc_id)
    // serves both aggs; loses map-side combine — the mega-doc rides
    // one partition)
    val t0 = System.nanoTime()
    val ent = entropyOver(toks.repartition(col("doc_id"))).collect()
    println(f"entropy one-exchange: ${(System.nanoTime() - t0) / 1e9}%.1f s over $nTok tokens " +
      s"(docs=${ent(0).getLong(0)}, mega-doc=$megaDoc tokens)")
    report("entropy one-exchange")

    // shape B: the free-planned two-exchange form (hash on (doc,tok)
    // with partial agg, then re-shuffle the distinct-token rollup on
    // doc) — the skew-robust sibling the scaladoc names as the
    // inverse trade
    val t1b = System.nanoTime()
    val entB = entropyOver(toks).collect()
    println(f"entropy two-exchange: ${(System.nanoTime() - t1b) / 1e9}%.1f s " +
      s"(docs=${entB(0).getLong(0)})")
    report("entropy two-exchange")

    if (nEdge == 0L) { spark.stop(); return }

    // ---- subject 2: connected components over 3*10^7 edges ---------
    // a 10^6-node path (adversarial diameter) + random clusters of
    // ~4 nodes each over the remaining id space
    val path = spark.range(0, 1000000L, 1, 16)
      .select((col("id") + 2000000000L).as("a_id"),
        (col("id") + 2000000001L).as("b_id"))
    val clusters = spark.range(0, nEdge - 1000000L, 1, 64)
      .select((pmod(xxhash64(col("id")), lit(10000000L)) * 4
        + pmod(xxhash64(col("id"), lit(2)), lit(4))).as("a_id"),
        (pmod(xxhash64(col("id")), lit(10000000L)) * 4
          + pmod(xxhash64(col("id"), lit(3)), lit(4))).as("b_id"))
    val t1 = System.nanoTime()
    val cc = ops.Llm.connectedComponents(path.union(clusters))
    val nComp = cc.select(countDistinct(col("comp"))).head().getLong(0)
    println(f"connected components: ${(System.nanoTime() - t1) / 1e9}%.1f s over $nEdge edges " +
      s"-> $nComp components (path of 10^6 planted)")
    report("cc")

    spark.stop()
  }
}
