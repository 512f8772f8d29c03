package graft

import org.apache.spark.sql.functions._

/** §8.r11.3 A/B: in-plan no-op-stopped BPE training (Iterate.fixed,
  * k plan-rounds regardless of where the threshold binds) vs the
  * driver-measured loop (collect the 0-or-1-row rule per round, exit
  * on empty) — at k = 32 / minCount = 1500, where sf0.01 stops at
  * round 10 (22 dead rounds for the in-plan form). Also asserts the
  * two forms produce identical vocabularies. Results → BASELINE.md.
  */
object ScratchBpeFixpoint {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val k = args.headOption.map(_.toInt).getOrElse(32)
    val minCount = 1500L
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.io.Readers.table(spark, dir, "documents")
    docs.count() // warm the scan

    def render(df: org.apache.spark.sql.DataFrame) =
      df.select(col("w"), concat_ws(" ", col("syms")).as("m"), col("cnt"))

    def time(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s $s%8.2f s   rows=$n")
      n
    }

    // alternate the order across reps so JIT warmup doesn't bias one form
    for (rep <- 1 to 2) {
      time(s"in-plan k=$k rep$rep") {
        render(ops.Bpe.trainedVocab(docs, k, minCount)).count()
      }
      time(s"driver-loop k=$k rep$rep") {
        render(ops.Bpe.trainedVocabDriver(docs, k, minCount)).count()
      }
    }

    for (rep <- 1 to 2) {
      time(s"rules in-plan k=$k rep$rep") {
        ops.Bpe.rulesTable(docs, k, minCount).count()
      }
      time(s"rules driver k=$k rep$rep") {
        ops.Bpe.rulesTableDriver(docs, k, minCount).count()
      }
    }

    val ra = ops.Bpe.rulesTable(docs, k, minCount)
    val rb = ops.Bpe.rulesTableDriver(docs, k, minCount)
    val rdiff = ra.exceptAll(rb).count() + rb.exceptAll(ra).count()
    println(s"rules diff rows = $rdiff (must be 0)")
    assert(rdiff == 0, "driver rules table diverged from in-plan form")

    val a = render(ops.Bpe.trainedVocab(docs, k, minCount))
    val b = render(ops.Bpe.trainedVocabDriver(docs, k, minCount))
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"vocab diff rows = $diff (must be 0)")
    assert(diff == 0, "driver-loop vocabulary diverged from in-plan form")
    spark.stop()
  }
}
