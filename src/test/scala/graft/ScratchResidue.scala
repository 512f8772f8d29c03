package graft

import org.apache.spark.sql.SparkSession

/** Round 18, second session — measure the per-key checkpoint RESIDUE
  * the drivers accumulate: every registry key's operator-internal
  * `localCheckpoint`s that are reachable from its RESULT plan stay in
  * the block manager after the driver consumes the result, until some
  * later GC lets ContextCleaner collect them. Across a 286-key suite
  * that standing population is exactly the pressure class three
  * rounds of driver-artifact anomalies were adjudicated to (and the
  * composite's targeted frees measurably removed for ITS stages).
  *
  * Protocol: run every registry key (count() the result — the bench
  * consumption); in `free` mode, after each key unpersist every
  * LogicalRDD checkpoint reachable from its result plan EXCEPT those
  * protected by SessionCache.liveRddIds (the logic is inlined in
  * main() below — the harness-level reclamation under test; it was
  * measured unnecessary and deliberately NOT shipped as an ops
  * helper), and report the
  * block manager's cached-RDD population + bytes after each letter
  * group and at the end. SessionCache relations are PROTECTED by the
  * free and expected to survive in both modes.
  *
  * Run: sbt "Test/runMain graft.ScratchResidue [sfDir] [free|keep]".
  */
object ScratchResidue {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val freeMode = args.drop(1).headOption.contains("free")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-res").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def storage(): (Int, Long) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.length, infos.map(i => i.memSize + i.diskSize).sum)
    }

    val t0 = System.nanoTime()
    var failed = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        df.count()
        // the harness-level reclamation under test: free the consumed
        // result's checkpoint leaves, protecting session-cached
        // relations later keys still read
        if (freeMode) {
          val protect = ops.SessionCache.liveRddIds(spark)
          df.queryExecution.analyzed.collect {
            case l: org.apache.spark.sql.execution.LogicalRDD
              if !protect.contains(l.rdd.id) => l.rdd
          }.foreach(_.unpersist(blocking = false))
        }
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(s"$name failed: ${e.getMessage}")
      }
    }
    val (n, bytes) = storage()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"RESIDUE mode=${if (freeMode) "free" else "keep"} sf=$dir " +
      f"rdds=$n bytes=${bytes / 1024 / 1024} MB wall=$wall%.1f s failed=$failed")
    spark.stop()
  }
}
