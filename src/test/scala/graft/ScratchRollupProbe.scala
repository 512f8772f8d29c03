package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScratchRollupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val c = f
        println(f"[rollup] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($c rows)")
      }
    }
    time("daily (type, day) rollup") {
      io.Readers.table(spark, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1))).count()
    }
    time("per-(type,user) rollup") {
      io.Readers.table(spark, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1))).count()
    }
    spark.stop()
  }
}
