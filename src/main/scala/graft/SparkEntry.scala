package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The featureCounts-shaped interval join — the engine's reason to
    * exist — through the custom strategy. */
  def entry(spark: SparkSession): DataFrame =
    queries("interval_join_count")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ IntervalQueries.queries ++ CoverageQueries.queries ++
      DedupQueries.queries ++ EmbeddingQueries.queries ++ TextQueries.queries ++
      MultimodalQueries.queries ++ PileupQueries.queries ++ SourceQueries.queries ++
      StreamingQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ IntervalQueries.oracle ++ CoverageQueries.oracle ++
      DedupQueries.oracle ++ EmbeddingQueries.oracle ++ TextQueries.oracle ++
      MultimodalQueries.oracle ++ PileupQueries.oracle ++ SourceQueries.oracle ++
      StreamingQueries.oracle
}
