package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator pack: relational surface (SURVEY §2 stock
  * side), graph/Cypher surface (SURVEY §2 graph side), and the
  * training-data pipeline operators (dedup / similarity / text).
  */
object SparkEntry {
  /** Flagship: a Cypher MATCH through the full engine (parser ->
    * clause builders -> Catalyst) over a property graph loaded from
    * sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    pipeline.GraphQueries.queries("g02_chain_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relational.RelationalQueries.queries ++ pipeline.GraphQueries.queries ++
      pipeline.PipelineQueries.queries ++ streaming.StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    relational.RelationalQueries.oracleSql ++ pipeline.GraphQueries.oracleSql ++
      pipeline.PipelineQueries.oracleSql ++ streaming.StreamQueries.oracleSql
}
