package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput measurement for the round-13 codec path: N synthetic
  * 64×64 RGB images, PNG-encoded (mixed filters) and JPEG-encoded,
  * pushed through [[graft.ops.Multimodal.mediaFeatureRows]] (decode +
  * feature extraction) — the per-core MB/s and images/s numbers the
  * multimodal scale posture cites. Also times the IVF build+probe
  * over the extracted features (the find-media-like-this path).
  *
  * Run: `sbt "Test/runMain graft.ScratchCodecScale [nImages]"`.
  */
object ScratchCodecScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-codecscale-${System.getProperty("user.name")}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[codecscale] $label: $s%.2f s")
      (r, s)
    }

    val (w, h) = (64, 64)
    // deterministic per-image content (seeded by id), built and
    // encoded EXECUTOR-side so generation parallelizes
    def body(id: Long): Array[Byte] = Array.tabulate(w * h * 3) { i =>
      (((id * 2654435761L + i * 31) >>> 7) & 0xff).toByte
    }
    val pngs = spark.range(n).as[Long].mapPartitions(_.map(id =>
        (id, graft.ops.ImageCodec.encodePng(w, h, 3, body(id), y => (y % 5).toInt))))
      .localCheckpoint()
    val pngBytes = pngs.map(_._2.length.toLong).reduce(_ + _)
    println(f"[codecscale] corpus: $n png images, ${pngBytes / 1e6}%.1f MB encoded")
    val (_, tPng) = time(s"png decode+features x$n") {
      graft.ops.Multimodal.mediaFeatureRows(pngs).count()
    }
    println(f"[codecscale] png: ${n / tPng}%.0f img/s, ${pngBytes / 1e6 / tPng}%.1f MB/s (32 threads)")

    val jpgs = spark.range(n).as[Long].mapPartitions(_.map(id =>
        (id, graft.ops.ImageCodec.encodeJpeg(w, h, 3, body(id)))))
      .localCheckpoint()
    val jpgBytes = jpgs.map(_._2.length.toLong).reduce(_ + _)
    val (_, tJpg) = time(s"jpeg decode+features x$n") {
      graft.ops.Multimodal.mediaFeatureRows(jpgs).count()
    }
    println(f"[codecscale] jpeg: ${n / tJpg}%.0f img/s, ${jpgBytes / 1e6 / tJpg}%.1f MB/s (32 threads)")

    // retrieval over the extracted features: IVF build + 100 probes
    val feats = graft.ops.Multimodal.mediaFeatureRows(pngs).localCheckpoint()
    val (_, tBuild) = time("IVF build over media features (nlist=64)") {
      graft.ops.IvfIndex.buildIndex(spark, feats, "codecscale_ivf", nlist = 64)
    }
    try {
      val probes = feats.limit(100)
        .select(col("vec_id").as("p_id"), col("v").as("pv")).localCheckpoint()
      val (cnt, tProbe) = time("IVF probe x100 (nprobe=8, k=10)") {
        graft.ops.IvfIndex.probe(spark, probes, "codecscale_ivf", nprobe = 8, k = 10).count()
      }
      println(f"[codecscale] probe: $cnt rows, ${100 / tProbe}%.1f probes/s; build $tBuild%.2f s")
    } finally graft.io.TableManifest.drop(spark, "codecscale_ivf")
    spark.stop()
  }
}
