package graft.core

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned write produces hive layout and pruned reads") {
    val dir = Files.createTempDirectory("graft_archive").toString
    val events = Tables.load(spark, sf0001, "events")
    Sinks.writeDatePartitioned(events, col("ts"), dir)

    // hive-style directories exist
    val years = new java.io.File(dir).list().filter(_.startsWith("year="))
    assert(years.nonEmpty)

    val back = Sinks.readDatePartitioned(spark, dir)
    assert(back.count() == events.count())

    // partition pruning: a filter on the partition column must appear as
    // PartitionFilters in the scan, not a post-scan Filter over all rows
    val pruned = back.filter(col("year") === 2024 && col("month") === 1 && col("day") === 2)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("(day#") || scan.contains("day="),
      s"expected partition filters in:\n$scan")
    // row counts agree with the unpartitioned predicate
    val expected = events.filter(
      year(col("ts")) === 2024 && month(col("ts")) === 1 && dayofmonth(col("ts")) === 2).count()
    assert(pruned.count() == expected)
  }
}
