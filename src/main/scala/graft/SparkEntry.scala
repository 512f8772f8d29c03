package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.joinMultiwayStar(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Aggregations.queries ++
      ops.Windows.queries ++ ops.SetSort.queries ++ ops.Udx.queries ++
      ops.Scalar.queries ++ ops.Llm.queries ++ ops.Llm2.queries ++
      ops.Streaming.queries ++ ops.Curation.queries ++
      ops.Stats.queries ++ ops.Layout.queries ++ ops.Analytics.queries ++
      ops.Curation2.queries ++ ops.Graph.queries ++
      ops.InfoTheory.queries ++ ops.Bpe.queries ++ ops.Bipartite.queries ++
      ops.Quality.queries ++ ops.Insights.queries ++
      ops.Embeddings.queries ++ ops.Tpch.queries ++
      ops.CurationPipeline.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = oracle.OracleSql.sql
}
