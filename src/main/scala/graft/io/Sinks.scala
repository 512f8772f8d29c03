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

  /** ORC export — the second columnar interchange format (Spark's ORC
    * datasource is built in). Same predicate-pushdown/column-pruning
    * contract as the parquet scans (asserted in IngestSinkSpec), so a
    * downstream that standardizes on ORC loses nothing. zstd to match
    * the parquet sink's compression posture.
    */
  def exportOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("compression", "zstd")
      .orc(path)

  /** ORC ingest, schema-on-read (ORC files are self-describing, like
    * parquet — no declared-schema path needed).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Write a table bucketed (and sorted) by its join key. Two tables
    * bucketed the same way join with NO shuffle exchange on either
    * side — at 100 TB this converts every recurring fact⋈fact join on
    * the bucket key from a full-network shuffle into a local merge.
    * Bucketing metadata lives in the session catalog, hence
    * `saveAsTable` rather than a path write.
    *
    * The `repartition(buckets, key)` uses the SAME hash family
    * (murmur3 `pmod`) as the bucket-id assignment, so each write task
    * holds exactly one bucket id → one file per bucket. Without it,
    * every task writes a file into every bucket it touches — up to
    * tasks×buckets files, the small-file explosion bucketing is
    * supposed to prevent. `buckets` is the write-parallelism knob.
    */
  def writeBucketed(df: DataFrame, tableName: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)

  /** Compact an append-grown partitioned table back to one file per
    * partition. Append-only growth (IvfIndex.appendToIndex, streaming
    * micro-batch sinks) is the right WRITE posture — nothing rewrites —
    * but each append adds files, and scan/listing cost grows with file
    * count, not data size; periodic compaction is the standard
    * counterpart.
    *
    * Stage-then-swap: the compacted copy is first written as a DURABLE
    * sibling table (`<table>__compact_tmp`), and only then does the
    * overwrite of the real table run — reading from the staged copy,
    * never from the files it is replacing. At no point is the only
    * complete copy of the data in volatile storage: if the swap write
    * dies mid-overwrite, the staging table still holds every row (an
    * executor-memory snapshot would not survive the JVM). At 100 TB
    * the same two steps are write-new-files + transactional manifest
    * swap. `repartition(partitionCol)` gives one writer — hence one
    * file — per partition directory. Row multiset is untouched (spec'd
    * via checksum). NOT concurrency-safe against in-flight appends (an
    * append landing between stage and swap is lost) — quiesce writers
    * first, exactly as non-transactional parquet compaction always
    * requires.
    */
  def compactPartitioned(spark: SparkSession, tableName: String,
      partitionCol: String): Unit = {
    val tmp = tableName + "__compact_tmp"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    spark.table(tableName)
      .repartition(col(partitionCol))
      .write.mode("overwrite").format("parquet").partitionBy(partitionCol)
      .saveAsTable(tmp)
    spark.table(tmp)
      .repartition(col(partitionCol))
      .write.mode("overwrite").format("parquet").partitionBy(partitionCol)
      .saveAsTable(tableName)
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    spark.catalog.refreshTable(tableName)
  }

  /** [[compactPartitioned]] for BUCKETED tables
    * ([[writeBucketed]] / `IncrementalDedup.appendToIndex` growth).
    * The bucket spec is read from the CATALOG, not from the caller: a
    * caller-supplied (key, buckets) that disagreed with the table's
    * real spec would silently rewrite the layout and break the
    * no-shuffle join property every bucketed consumer relies on. Same
    * durable stage-then-swap as [[compactPartitioned]]; one file per
    * bucket after ([[writeBucketed]]'s aligned repartition); row
    * multiset and bucket layout spec'd unchanged.
    */
  def compactBucketed(spark: SparkSession, tableName: String): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tableName))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$tableName has no bucket spec — use compactPartitioned"))
    val key = spec.bucketColumnNames match {
      case Seq(k) => k
      case cols => throw new IllegalArgumentException(
        s"$tableName is bucketed on $cols; compactBucketed supports single-column specs")
    }
    val tmp = tableName + "__compact_tmp"
    // read by PATH, not by table name: a catalog read of a table
    // bucketed on the same (key, n) makes EnsureRequirements elide the
    // aligned repartition as redundant, after which the planner ALSO
    // disables the bucketed scan (nothing above still requires the
    // distribution) — the write then runs off file-packed splits and
    // leaves tasks×buckets files, defeating the compaction. The path
    // read carries no bucket metadata, so the aligned exchange stays
    // in the plan. (Observed on the executed WriteFiles plan: no
    // Exchange + "Bucketed: false (disabled by query planner)".)
    def byPath(t: String): DataFrame = spark.read.parquet(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t)).location.toString)
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    writeBucketed(byPath(tableName), tmp, key, spec.numBuckets)
    writeBucketed(byPath(tmp), tableName, key, spec.numBuckets)
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    spark.catalog.refreshTable(tableName)
  }
}
