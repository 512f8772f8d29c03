package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round 18 — the hp/bp partition fan-out measurement (r17 verdict
  * item 5 / the standing "256 is unmeasured" note): the v2 hash index
  * partitions on the hash's first hex BYTE (256 directories). This
  * scratch measures the alternatives WITHOUT touching the index API —
  * first nibble (16), first byte (256), first 3 nibbles (4096) — at
  * two index scales, on the two probe shapes that matter:
  *
  *   - trickle (10-doc batch): pruning is the whole game — the batch
  *     touches ≤ 10 directories, so bigger fan-out reads less.
  *   - bulk (500-doc batch): the batch's hashes cover most of a small
  *     fan-out (pruning saves little) and 500/4096 of a big one.
  *
  * Each (scale, fanout) builds a throwaway hp-partitioned table of
  * synthetic sha2 rows (uniform keys — exactly the real index's key
  * distribution), then times the pruned probe join REPS times, plus a
  * v1-style unpruned full-scan reference. Build time and file counts
  * are reported too: fan-out is bounded above by small-file pressure
  * (at 100 TB, 4096 directories × compaction cycle files is the
  * steady-state object count the store must sustain).
  *
  * Run: sbt "Test/runMain graft.ScratchFanout [nRows ...]".
  */
object ScratchFanout {

  def main(args: Array[String]): Unit = {
    val scales: Seq[Long] =
      if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(50000L, 10000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-fan").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("fanout").toString
    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    for (n <- scales; nibbles <- Seq(1, 2, 3)) {
      val fanout = 1 << (4 * nibbles)
      val path = s"$root/idx_n${n}_f$fanout"
      val rows = spark.range(0, n)
        .select(sha2(col("id").cast("string"), 256).as("text_hash"),
          col("id").as("keep_id"))
        .withColumn("hp", substring(col("text_hash"), 1, nibbles))
      val (buildS, _) = timed {
        rows.repartition(col("hp"))
          .write.mode("overwrite").partitionBy("hp").parquet(path)
        n
      }
      val files = {
        var c = 0L
        java.nio.file.Files.walk(java.nio.file.Paths.get(path))
          .filter(p => p.toString.endsWith(".parquet")).forEach(_ => c += 1)
        c
      }
      val idx = spark.read.parquet(path)
      for (batch <- Seq(10L, 500L)) {
        // deterministic MIXED delta (r18 review fix: the first cut's
        // id*97 rows all landed inside [0, n) and probed as 100 %
        // hits): even ids hit (their hash exists in the index), odd
        // ids miss (shifted past n — fresh content), the real
        // admission shape. The hp collect is part of every timed rep:
        // the real hashProbe pays it per probe.
        val delta = spark.range(0, batch)
          .select(sha2(when(col("id") % 2 === 0, col("id") * 7)
            .otherwise(col("id") + lit(10 * n)).cast("string"), 256)
            .as("text_hash"))
          .localCheckpoint()
        val reps = 3
        var dirsTouched = 0
        val pruned = (1 to reps).map { _ =>
          timed {
            val hps = delta
              .select(substring(col("text_hash"), 1, nibbles).as("hp"))
              .distinct().collect().map(_.getString(0)).toSeq
            dirsTouched = hps.size
            idx.filter(col("hp").isin(hps: _*)).join(delta, "text_hash").count()
          }._1
        }
        val full = (1 to reps).map { _ =>
          timed(idx.join(delta, "text_hash").count())._1
        }
        val hits = idx.join(delta, "text_hash").count()
        println(f"n=$n%d fanout=$fanout%4d batch=$batch%3d hits=$hits%3d " +
          f"build=$buildS%6.1fs files=$files%5d dirsTouched=$dirsTouched%4d " +
          f"pruned=${pruned.map(t => f"$t%.2f").mkString("/")}s " +
          f"full=${full.map(t => f"$t%.2f").mkString("/")}s")
        ops.Checkpoints.free(delta)
      }
    }
    spark.stop()
  }
}
