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
}
