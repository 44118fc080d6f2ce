package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CapabilityQueries, ExtensionQueries, PipelineQueries,
  ReferenceQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.queries("q1_task_durations")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.4. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.queries ++ ExtensionQueries.queries ++
      CapabilityQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracleSql ++ ExtensionQueries.oracleSql ++
      CapabilityQueries.oracleSql ++ PipelineQueries.oracleSql
}
