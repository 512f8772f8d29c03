package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch: the round-7 events_rfm A/B — three global `ntile(5)`
  * windows (the round-6 shape, each one a single-task sort of the
  * whole per-user relation) vs the bucketed boundary-rank shape now
  * shipped (boundaries from per-value-bucket counts, assignment via a
  * broadcast of 4 keys per metric). Outputs are asserted IDENTICAL
  * row-for-row; the fixture is a generated per-user metric relation
  * large enough (default 4M users) that the single-task sorts
  * dominate. Run: sbt "Test/runMain graft.ScratchRfm [nUsers]".
  */
object ScratchRfm {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    // per-user metrics with realistic shapes: r_days 0..364 (uniform),
    // freq Zipf-ish (mostly 1), monetary lognormal-ish positive
    val base = spark.range(n).select(
        col("id").as("user_id"),
        pmod(xxhash64(col("id"), lit("r")), lit(365L)).cast("int").as("r_days"),
        (lit(1L) + pmod(xxhash64(col("id"), lit("f")), lit(100L)) *
          when(pmod(xxhash64(col("id"), lit("fz")), lit(10L)) === 0, 1L).otherwise(0L))
          .as("freq"),
        (round((pmod(xxhash64(col("id"), lit("m")), lit(1000000L)).cast("double") / 100.0
          + 1.0), 2)).as("monetary"))
      .localCheckpoint()
    println(s"users: ${base.count()}")

    def naive(df: DataFrame): DataFrame = df
      .withColumn("r_quintile", ntile(5).over(
        Window.orderBy(col("r_days"), col("user_id"))))
      .withColumn("f_quintile", ntile(5).over(
        Window.orderBy(col("freq").desc, col("user_id"))))
      .withColumn("m_quintile", ntile(5).over(
        Window.orderBy(col("monetary").desc, col("user_id"))))

    def bucketed(df: DataFrame): DataFrame = {
      val keyed = df.select(lit("r").as("tag"),
          col("r_days").cast("double").as("ord"), col("user_id"))
        .unionAll(df.select(lit("f").as("tag"),
          (-col("freq")).cast("double").as("ord"), col("user_id")))
        .unionAll(df.select(lit("m").as("tag"),
          (-col("monetary")).as("ord"), col("user_id")))
        .withColumn("bucket", floor(col("ord")).cast("long"))
      val parts = keyed.groupBy(col("tag"), col("bucket")).agg(count(lit(1)).as("bn"))
      val wRun = Window.partitionBy(col("tag")).orderBy(col("bucket"))
      val wTot = Window.partitionBy(col("tag"))
      val ranked = parts
        .withColumn("cumb", sum(col("bn")).over(wRun))
        .withColumn("tot", sum(col("bn")).over(wTot))
      val wB = Window.partitionBy(col("tag"), col("b")).orderBy(col("bucket"))
      val pivots = ranked
        .select(col("tag"), col("bucket"), col("bn"), col("cumb"), col("tot"),
          explode(array((1 to 4).map(lit): _*)).as("b"))
        .withColumn("brank",
          col("b") * floor(col("tot") / 5).cast("long") +
            least(col("b").cast("long"), col("tot") % 5))
        .filter(col("brank") >= 1 && col("cumb") >= col("brank"))
        .withColumn("rn", row_number().over(wB))
        .filter(col("rn") === 1)
        .select(col("tag"), col("b"), col("bucket").as("pbucket"),
          (col("cumb") - col("bn")).as("off"), col("brank"))
      val wIn = Window.partitionBy(col("tag"), col("b")).orderBy(col("ord"), col("user_id"))
      val bounds = keyed.join(broadcast(pivots), Seq("tag"))
        .filter(col("bucket") === col("pbucket"))
        .withColumn("grn", col("off") + row_number().over(wIn))
        .filter(col("grn") === col("brank"))
        .select(col("tag"), col("ord").as("bord"), col("user_id").as("buid"))
      val bArr = bounds
        .groupBy(col("tag"))
        .agg(sort_array(collect_list(struct(col("bord"), col("buid")))).as("arr"))
        .groupBy()
        .agg(
          first(when(col("tag") === "r", col("arr")), ignoreNulls = true).as("rb"),
          first(when(col("tag") === "f", col("arr")), ignoreNulls = true).as("fb"),
          first(when(col("tag") === "m", col("arr")), ignoreNulls = true).as("mb"))
      def quint(arr: org.apache.spark.sql.Column, ord: org.apache.spark.sql.Column) =
        lit(1) + size(filter(arr, x =>
          (ord > x.getField("bord")) ||
            (ord === x.getField("bord") && col("user_id") > x.getField("buid"))))
      df.crossJoin(broadcast(bArr))
        .select(col("user_id"), col("r_days"), col("freq"), col("monetary"),
          quint(col("rb"), col("r_days").cast("double")).as("r_quintile"),
          quint(col("fb"), (-col("freq")).cast("double")).as("f_quintile"),
          quint(col("mb"), -col("monetary")).as("m_quintile"))
    }

    // force FULL evaluation of the quintile columns — a bare count()
    // lets column pruning delete the naive form's windows outright
    def force(df: DataFrame): Long = df
      .agg(sum(col("r_quintile") + col("f_quintile") + col("m_quintile")))
      .head().getLong(0)
    def time(label: String, f: => Long): Unit = {
      (1 to 2).foreach { rep =>
        System.gc()
        val t0 = System.nanoTime()
        val c = f
        println(f"$label rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s (checksum $c)")
      }
    }
    time("bucketed", force(bucketed(base)))
    time("naive-global-ntile", force(naive(base)))

    // identical assignments, row for row
    val mismatch = bucketed(base)
      .except(naive(base).select("user_id", "r_days", "freq", "monetary",
        "r_quintile", "f_quintile", "m_quintile"))
      .count()
    println(s"mismatching rows: $mismatch")
    assert(mismatch == 0, "bucketed shape must reproduce ntile exactly")
    spark.stop()
  }
}
