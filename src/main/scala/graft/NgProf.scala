package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object NgProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[prof] $label rep$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    val bigrams = graft.functions.TextExpressions.wordShingles(col("text"), 2)
    val sig = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), bigrams.as("grams"))
      .filter(size(col("grams")) > 0)
      .select(col("doc_id"), graft.functions.TextExpressions.simHash64(col("grams")).as("simhash"))
    time("sig only")(sig.count())
    val banded = sig.select(col("doc_id"), col("simhash"),
        explode(array((0 until 8).map(k =>
          struct(lit(k).as("band"),
            shiftright(col("simhash"), k * 8).bitwiseAND(0xFFL).as("bv"))): _*)).as("e"))
      .select(col("doc_id"), col("simhash"), col("e.band").as("band"), col("e.bv").as("bv"))
    time("banded")(banded.count())
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.simhash").as("a_sh"), col("b.simhash").as("b_sh"))
    time("cand join (count)")(cand.count())
    time("cand distinct")(cand.distinct().count())
    spark.stop()
  }
}
