package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned archive sinks: the reference's date-partitioned key layout
  * (`Maxmind/YYYY/MM/DD/...`, /root/reference/downloader.go:64,
  * download/common.go:95-101) as *real* partition columns instead of
  * path-string conventions — so partition pruning replaces prefix
  * listing, and the timezone is UTC by construction (the reference mixes
  * local-time directories with UTC file prefixes).
  */
object Sinks {

  /** Write `df` date-partitioned by the UTC (year, month, day) of
    * `tsCol`. Readers filtering on the partition columns scan only the
    * matching directories (partition pruning — the fixed version of the
    * reference's dedup-scope listing). */
  def writeDatePartitioned(df: DataFrame, tsCol: Column, path: String,
                           mode: String = "overwrite"): Unit =
    df.withColumn("year", year(tsCol).cast("int"))
      .withColumn("month", month(tsCol).cast("int"))
      .withColumn("day", dayofmonth(tsCol).cast("int"))
      .write.mode(mode)
      .partitionBy("year", "month", "day")
      .parquet(path)

  /** Read a date-partitioned archive; `year/month/day` come back as
    * partition columns usable for pruning. */
  def readDatePartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
