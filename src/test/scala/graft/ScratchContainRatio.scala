package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** §8.r16 item 4 pulled into round 15's post-close wave: MEASURED
  * recall of the promoted banded containment branch at PLANTED
  * extreme size ratios — the documented honesty boundary of the
  * 64-band × 2-row curve (P[candidate | J] = 1−(1−J²)⁶⁴; a
  * τ=0.8-contained pair at size ratio k has bigram-Jaccard ≈ 1/k).
  *
  * Method: into the sf0.3 corpus (above the Σ df² switch, so the
  * shipped key takes the banded branch) plant `nPerRatio` pairs per
  * ratio k ∈ {2, 4, 8, 16}: A = fresh-vocab token sequence of length
  * m, B = A's text + (k−1)·m fresh tail tokens — containment(A,B)=1
  * on bigram sets by construction, J ≈ 1/k. Fresh per-pair vocab
  * prevents accidental cross-plant pairs; the sf0.3 body keeps the
  * dispatch honest. Reports per-ratio observed recall vs the curve's
  * prediction. Run: sbt "Test/runMain graft.ScratchContainRatio".
  */
object ScratchContainRatio {

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.nonEmpty) args(0) else "/tmp/sf03"
    val outDir = "/tmp/sf03plant"
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

    val ratios = Seq(2, 4, 8, 16)
    val nPerRatio = 40
    val m = 30 // tokens in the small doc
    val rnd = new scala.util.Random(42)
    val base = graft.io.Readers.table(spark, baseDir, "documents")
    val cols = base.columns
    // planted ids start far above the corpus's
    var nextId = 10000000L
    val plants = ratios.flatMap { k =>
      (0 until nPerRatio).map { i =>
        val vocab = s"zq${k}x$i"
        val small = (0 until m).map(j => s"${vocab}_${rnd.nextInt(12)}_$j")
        val tail = (0 until (k - 1) * m).map(j => s"${vocab}_t${rnd.nextInt(99)}_$j")
        val aId = nextId; val bId = nextId + 1; nextId += 2
        Seq((aId, small.mkString(" "), k),
          (bId, (small ++ tail).mkString(" "), k))
      }
    }.flatten
    val plantDf = plants.toDF("doc_id", "text", "ratio")
    // write the planted corpus: base columns preserved, planted rows
    // get lang=en and neutral metadata
    val langLit = lit("en")
    val plantedDocs = base.unionByName(
      plantDf.select(
        col("doc_id") +: cols.toSeq.filter(_ != "doc_id").map {
          case "text" => col("text")
          case "lang" => langLit.as("lang")
          case c => lit(null).cast(base.schema(c).dataType).as(c)
        }: _*),
      allowMissingColumns = false)
    val fs = new java.io.File(outDir)
    if (!fs.isDirectory) fs.mkdirs()
    plantedDocs.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    // the key only reads documents; nothing else needs copying

    val vol = ops.PairJoins.pairVolume(ops.PairJoins.bigramDfreq(spark, outDir))
    println(f"pairVolume=$vol%.3e banded=${vol > ops.PairJoins.BandedPairVolume}")
    require(vol > ops.PairJoins.BandedPairVolume, "plant must stay above the switch")

    val t0 = System.nanoTime()
    val got = ops.Curation.dedupNgramContainment(spark, outDir)
      .select(col("a_id").cast("long"), col("b_id").cast("long"))
      .as[(Long, Long)].collect().toSet
    println(f"shipped containment pairs=${got.size}%d  ${(System.nanoTime()-t0)/1e9}%.1f s")
    ratios.foreach { k =>
      val planted = plants.grouped(2).collect {
        case Seq((a, _, `k`), (b, _, _)) => (a, b)
      }.toSeq
      val hit = planted.count(got)
      val jApprox = (m - 1).toDouble / (k * m - 1)
      val pred = 1 - math.pow(1 - jApprox * jApprox, 64)
      println(f"ratio $k%2d: recall ${hit.toDouble / planted.size}%.3f " +
        f"($hit/${planted.size})  J≈$jApprox%.3f  curve-predicted $pred%.3f")
    }
    spark.stop()
  }
}
