package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "old", 10.0), (2L, "old", 20.0), (3L, "old", 30.0))
    .toDF("k", "status", "v")

  test("upsert: updates win on key, inserts land, untouched rows carry through") {
    val updates = Seq((2L, "new", 99.0), (4L, "new", 40.0)).toDF("k", "status", "v")
    val got = Merge.upsert(base, updates, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "old", 10.0), (2L, "new", 99.0), (3L, "old", 30.0), (4L, "new", 40.0)))
  }

  test("upsert with empty updates is identity; schema mismatch fails fast") {
    val empty = base.limit(0)
    assert(Merge.upsert(base, empty, Seq("k")).count() == 3)
    val wrong = Seq((1L, "x")).toDF("k", "status")
    intercept[IllegalArgumentException] {
      Merge.upsert(base, wrong, Seq("k"))
    }
  }

  test("upsert plan: base side anti-joins against a broadcast of the batch") {
    val updates = Seq((2L, "new", 99.0)).toDF("k", "status", "v")
    val plan = Merge.upsert(base, updates, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }

  test("upsertInto: stored table updated in place via atomic swap, no debris") {
    val dir = java.nio.file.Files.createTempDirectory("merge").toString
    val path = s"$dir/t"
    base.write.parquet(path)
    val updates = Seq((3L, "new", 33.0), (9L, "new", 90.0)).toDF("k", "status", "v")
    val n = Merge.upsertInto(spark, path, updates, Seq("k"))
    assert(n == 4)
    val got = spark.read.parquet(path).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "old", 10.0), (2L, "old", 20.0), (3L, "new", 33.0), (9L, "new", 90.0)))
    val siblings = new java.io.File(dir).list().toSeq
    assert(siblings == Seq("t"), s"swap debris: $siblings")
  }
}
