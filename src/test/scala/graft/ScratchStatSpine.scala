package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale A/B for the round-13 rank-window stat rewrite (r12 verdict
  * item 4): at 10⁷ rows across 5 segments, measure the OLD raw-row
  * rank-window form (a pair's window partition = two segments' FULL
  * rows through one sort — the `weak`-graded shape) against the NEW
  * distinct-value-SPINE form (per-(pair, value) rollup + cumulative
  * over ≤ |values| spine rows) for Mann–Whitney cells and the
  * winsorize bounds, asserting the two forms ROW-IDENTICAL in-run.
  *
  * The structural claim in numbers: the raw form sorts O(rows/pair)
  * inside single tasks; the spine form's window partitions are
  * value-domain-bounded (cents here: ≤ ~1.1 M distinct) and the
  * heavy lifting is a map-side-combinable rollup. The gap widens
  * with rows-per-value density; the value domain is the knob that
  * does NOT grow with the corpus.
  *
  * Run: `sbt "Test/runMain graft.ScratchStatSpine [nRows]"`.
  */
object ScratchStatSpine {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-statspine-${System.getProperty("user.name")}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[statspine] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // 5 segments, value domain ~200k distinct cents (dense ties — the
    // regime where the spine is much smaller than the rows)
    val c = spark.range(n).select(
      concat(lit("SEG"), (col("id") % 5)).as("segment"),
      (pmod(hash(col("id")), lit(200000)).cast("long")).as("bal_cents"))
      .localCheckpoint()
    println(s"[statspine] rows=$n distinct values=" +
      c.select(col("bal_cents")).distinct().count())

    val segs = c.select(col("segment")).distinct()
    val pairs = segs.select(col("segment").as("seg_a"))
      .crossJoin(segs.select(col("segment").as("seg_b")))
      .filter(col("seg_a") < col("seg_b"))

    // ---- Mann–Whitney cells: OLD raw-row rank windows
    def mwOld(): DataFrame = {
      val member = c.join(broadcast(pairs),
        col("segment") === col("seg_a") || col("segment") === col("seg_b"))
      val w = Window.partitionBy(col("seg_a"), col("seg_b")).orderBy(col("bal_cents"))
      val wt = Window.partitionBy(col("seg_a"), col("seg_b"), col("bal_cents"))
      member
        .withColumn("lo", rank().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(wt))
        .withColumn("r2", lit(2L) * col("lo") + col("cnt") - 1)
        .groupBy(col("seg_a"), col("seg_b"))
        .agg(count(when(col("segment") === col("seg_a"), 1)).as("n_a"),
          count(when(col("segment") === col("seg_b"), 1)).as("n_b"),
          sum(when(col("segment") === col("seg_a"), col("r2"))).as("r2_a"))
    }

    // ---- NEW spine form (the shipped shape)
    def mwSpine(): DataFrame = {
      val perVal = c.join(broadcast(pairs),
          col("segment") === col("seg_a") || col("segment") === col("seg_b"))
        .groupBy(col("seg_a"), col("seg_b"), col("bal_cents"))
        .agg(count(when(col("segment") === col("seg_a"), 1)).as("ca"),
          count(when(col("segment") === col("seg_b"), 1)).as("cb"))
      val wCum = Window.partitionBy(col("seg_a"), col("seg_b"))
        .orderBy(col("bal_cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perVal
        .withColumn("cnt", col("ca") + col("cb"))
        .withColumn("cumt", sum(col("cnt")).over(wCum))
        .groupBy(col("seg_a"), col("seg_b"))
        .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
          sum(col("ca") * (lit(2L) * col("cumt") - col("cnt") + 1)).as("r2_a"))
    }

    def cells(df: DataFrame): Seq[(String, String, Long, Long, Long)] =
      df.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(t => (t._1, t._2)).toSeq

    val oldCells = time("mann-whitney OLD raw-row rank windows")(cells(mwOld()))
    val newCells = time("mann-whitney NEW value-spine form")(cells(mwSpine()))
    require(oldCells == newCells, "forms must be row-identical")
    println(s"[statspine] mann-whitney cells identical across forms: ${newCells.size} pairs")

    // ---- winsorize bounds: OLD per-segment row_number vs NEW spine
    def winsorOld(): Seq[(String, Long, Long)] = {
      val ranked = c
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("segment")).orderBy(col("bal_cents"))))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy(col("segment"))))
      ranked.groupBy(col("segment")).agg(
        max(when(col("rn") === expr("(nn - 1) * 5 div 100 + 1"), col("bal_cents"))).as("lo"),
        max(when(col("rn") === expr("(nn - 1) * 95 div 100 + 1"), col("bal_cents"))).as("hi"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    }
    def winsorSpine(): Seq[(String, Long, Long)] = {
      val wCum = Window.partitionBy(col("segment")).orderBy(col("bal_cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      c.groupBy(col("segment"), col("bal_cents"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("nn", sum(col("cnt")).over(Window.partitionBy(col("segment"))))
        .groupBy(col("segment")).agg(
          max(when(expr("cum - cnt < (nn - 1) * 5 div 100 + 1")
            && expr("(nn - 1) * 5 div 100 + 1 <= cum"), col("bal_cents"))).as("lo"),
          max(when(expr("cum - cnt < (nn - 1) * 95 div 100 + 1")
            && expr("(nn - 1) * 95 div 100 + 1 <= cum"), col("bal_cents"))).as("hi"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    }
    val wOld = time("winsorize bounds OLD raw-row row_number")(winsorOld())
    val wNew = time("winsorize bounds NEW value-spine form")(winsorSpine())
    require(wOld == wNew, "winsorize bounds must be identical")
    println(s"[statspine] winsorize bounds identical across forms: $wNew")
    spark.stop()
  }
}
