package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sinks (SURVEY §2.1 `sink_parquet_partitioned`).
  *
  * Date-partitioned parquet is the 100 TB default layout: partition
  * pruning turns time-range scans into directory listings, and
  * downstream dynamic partition pruning applies on join keys. Writers
  * must repartition by the partition column first, or every task
  * writes a file into every date directory (small-file explosion at
  * scale).
  */
object Sinks {

  /** Write `df` partitioned by the date of `tsCol` and return the
    * partition column name added.
    */
  def writePartitionedByDate(df: DataFrame, tsCol: String, path: String): String = {
    df.withColumn("dt", to_date(col(tsCol)))
      .repartition(col("dt"))
      .write.mode("overwrite").partitionBy("dt").parquet(path)
    "dt"
  }

  /** Read a date-partitioned dataset back, optionally pruned to one day
    * (the filter lands in PartitionFilters, not a data scan).
    */
  def readPartitioned(spark: SparkSession, path: String, day: Option[String]): DataFrame = {
    val base = spark.read.parquet(path)
    day.map(d => base.filter(col("dt") === lit(d))).getOrElse(base)
  }

  /** Tabular CSV export (the reference class's output surface —
    * SURVEY §0.1 "tabular export"). Quotes/escapes RFC-4180-style,
    * explicit null marker, UTC timestamps; one file per partition —
    * `coalesce` upstream if a single file is required (driver-side
    * single-file writes don't scale; at 100 TB exports stay sharded).
    */
  def exportCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite")
      .option("header", header.toString)
      .option("nullValue", "")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(path)

  /** JSON-lines export (one object per row, schema-carrying). */
  def exportJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .json(path)

  /** Write a table bucketed (and sorted) by its join key. Two tables
    * bucketed the same way join with NO shuffle exchange on either
    * side — at 100 TB this converts every recurring fact⋈fact join on
    * the bucket key from a full-network shuffle into a local merge.
    * Bucketing metadata lives in the session catalog, hence
    * `saveAsTable` rather than a path write.
    */
  def writeBucketed(df: DataFrame, tableName: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)

  /** Compact an append-grown partitioned table back to one file per
    * partition. Append-only growth (IvfIndex.appendToIndex, streaming
    * micro-batch sinks) is the right WRITE posture — nothing rewrites —
    * but each append adds files, and scan/listing cost grows with file
    * count, not data size; periodic compaction is the standard
    * counterpart. The snapshot is materialized (executor-local
    * checkpoint) BEFORE the overwrite so the rewrite never reads the
    * files it is replacing; `repartition(partitionCol)` gives one
    * writer — hence one file — per partition directory. Row multiset
    * is untouched (spec'd byte-identical via checksum). At 100 TB the
    * same operation is a transactional manifest swap; the
    * materialize-then-swap shape is what carries.
    */
  def compactPartitioned(spark: SparkSession, tableName: String,
      partitionCol: String): Unit = {
    val snapshot = spark.table(tableName).localCheckpoint()
    snapshot
      .repartition(col(partitionCol))
      .write.mode("overwrite").format("parquet").partitionBy(partitionCol)
      .saveAsTable(tableName)
    spark.catalog.refreshTable(tableName)
  }

  /** [[compactPartitioned]] for BUCKETED tables
    * ([[writeBucketed]] / `IncrementalDedup.appendToIndex` growth):
    * the rewrite must re-declare the same bucket spec, or the table
    * silently loses the no-shuffle join property every bucketed
    * consumer relies on. One file per bucket after; row multiset and
    * bucket layout spec'd unchanged.
    */
  def compactBucketed(spark: SparkSession, tableName: String, key: String,
      buckets: Int): Unit = {
    val snapshot = spark.table(tableName).localCheckpoint()
    writeBucketed(snapshot, tableName, key, buckets)
    spark.catalog.refreshTable(tableName)
  }
}
