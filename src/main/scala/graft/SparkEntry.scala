package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AuditQueries, CoreQueries, MiningQueries, PipelineQueries, RelationalQueries, StatQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q10(spark, "/root/testdata/sf0.001")

  private def all =
    CoreQueries.entries ++ PipelineQueries.entries ++ RelationalQueries.entries ++
      AuditQueries.entries ++ StatQueries.entries ++ MiningQueries.entries

  /** One entry per implemented operator from SURVEY.md §2. Every
    * declared query has an oracleSql row (round 10 re-based the three
    * sketch entries onto deterministic oracle-exact estimators; the
    * HLL++/KLL/Misra-Gries formulations live on as
    * [[graft.queries.EngineNative.fastPaths]], outside this map). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q, _) => n -> q }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.map { case (n, _, sql) => n -> sql }.toMap
}
