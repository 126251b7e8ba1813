package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{LlmQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY.md §2) to a
  * DataFrame builder; `oracleSql` carries the DuckDB-equivalent SQL the
  * driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the EPIC pipeline shape (join → explode → filter → group-ALL). */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q20(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ LlmQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ LlmQueries.oracles
}
