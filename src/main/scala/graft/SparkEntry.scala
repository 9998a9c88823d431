package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{EventAnalytics, GraphQueries, Relational, RunAnalytics, SourceQueries, TextAnalysis, TextDedup, VectorSearch}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers one `Q` in `registry`; the
  * driver runs each via `Verify` at sf0.01 and diff-tests the result
  * against the DuckDB oracle SQL.
  */
object SparkEntry {

  val registry: Seq[Q] =
    Relational.all ++ EventAnalytics.all ++ RunAnalytics.all ++
      TextDedup.all ++ TextAnalysis.all ++ VectorSearch.all ++
      GraphQueries.all ++ SourceQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
