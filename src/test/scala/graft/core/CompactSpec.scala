package graft.core

import java.nio.file.Files

import graft.SparkSpec

class CompactSpec extends SparkSpec {
  import spark.implicits._

  test("compact collapses a many-file table preserving content") {
    val dir = Files.createTempDirectory("graft_compact").toString
    val data = (0L until 5000L).map(i => (i, s"row$i"))
    // simulate incremental appends: 20 small writes
    data.grouped(250).foreach { g =>
      g.toDF("id", "v").repartition(2).write.mode("append").parquet(dir)
    }
    def fileCount = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(fileCount >= 20)

    val n = Sinks.compact(spark, dir, targetMb = 128)
    assert(n == 1 && fileCount == 1)
    val back = spark.read.parquet(dir).as[(Long, String)].collect().sortBy(_._1)
    assert(back.toSeq == data)
  }

  test("compact refuses a hive-partitioned root (would destroy pruning)") {
    val dir = Files.createTempDirectory("graft_compact_part").toString
    val events = Tables.load(spark, sf0001, "events")
    Sinks.writeDatePartitioned(events, org.apache.spark.sql.functions.col("ts"), dir)
    intercept[IllegalArgumentException](Sinks.compact(spark, dir))
  }

  test("compactPartitioned compacts each leaf partition, preserving layout and rows") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_compact_tree").toString
    val events = Tables.load(spark, sf0001, "events")
    // two appends → ≥2 files per leaf partition
    Sinks.writeDatePartitioned(events, col("ts"), dir)
    Sinks.writeDatePartitioned(events, col("ts"), dir, mode = "append")
    val before = Sinks.readDatePartitioned(spark, dir).count()
    val (parts, files) = Sinks.compactPartitioned(spark, dir)
    assert(parts > 0 && files == parts) // tiny partitions → 1 file each
    val after = Sinks.readDatePartitioned(spark, dir)
    assert(after.count() == before)
    // partition pruning still works on the compacted layout: the scan
    // must carry NON-EMPTY partition filters (the key alone always
    // prints) and the pruned count must match the predicate
    val pruned = after.filter(col("year") === 2024 && col("month") === 1 && col("day") === 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [is"), s"empty partition filters:\n$plan")
    val direct = after.filter(col("day") === 2 && col("month") === 1 && col("year") === 2024).count()
    assert(pruned.count() == direct && direct > 0)
  }

  test("compactPartitioned rejects a flat (non-partitioned) directory") {
    val dir = Files.createTempDirectory("graft_compact_flat").toString
    (0L until 10L).map(i => (i, i)).toDF("a", "b").write.mode("append").parquet(dir)
    intercept[IllegalArgumentException](Sinks.compactPartitioned(spark, dir))
  }
}
