package graft

import org.apache.spark.sql.SparkSession

/** Scratch: does EliminateSorts strip the determinism ORDER BY under
  * Bench's count()? Run: sbt "Test/runMain graft.ScratchSort".
  */
object ScratchSort {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = ops.Relational.filterCompound(spark, "/root/testdata/sf0.01")
    val counted = df.groupBy().count()
    val plan = counted.queryExecution.optimizedPlan.toString
    println("SORT IN COUNT PLAN: " + plan.contains("Sort"))
    println(plan.linesIterator.take(8).mkString("\n"))
    spark.stop()
  }
}
