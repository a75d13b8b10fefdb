package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

/** The memoized-artifact registry must RELEASE what it evicts: a
  * localCheckpoint'ed DataFrame pins block-manager memory for the
  * session's life unless its underlying RDD is unpersisted, so LRU
  * eviction (or clear()) without release is a slow leak in a long-lived
  * session — capped cache, unbounded storage. These tests watch the
  * checkpointed RDD's storage level directly (robust against other
  * suites sharing the session's block manager).
  */
class ModelCacheSpec extends SparkSpec {

  private def ckptLevel(df: DataFrame): StorageLevel =
    df.queryExecution.analyzed.collectLeaves().collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.getStorageLevel
    }.getOrElse(fail("no LogicalRDD leaf — frame is not checkpointed"))

  private def ckptFrame(i: Int): DataFrame = {
    import spark.implicits._
    Seq((i, s"row$i")).toDF("id", "tag").localCheckpoint()
  }

  test("overfilling the cache evicts the eldest entry AND frees its blocks") {
    val cache = new PipelineQueries.BoundedModelCache[DataFrame](
      PipelineQueries.releaseCheckpoint)
    val frames = (0 until 33).map { i =>
      val f = ckptFrame(i)
      cache.getOrTrain((spark, "model-cache-spec", i))(f)
      f
    }
    // capacity is 32: entry 0 was evicted on the 33rd insert
    assert(ckptLevel(frames.head) == StorageLevel.NONE,
      "evicted entry still holds storage blocks")
    // survivors keep their blocks (eviction must not over-release)
    assert(frames.tail.forall(f => ckptLevel(f) != StorageLevel.NONE),
      "a live cache entry lost its storage blocks")
    // and the evicted key re-trains rather than returning the dead frame
    var retrained = false
    cache.getOrTrain((spark, "model-cache-spec", 0)) { retrained = true; ckptFrame(0) }
    assert(retrained, "evicted key did not re-train")
    cache.clear()
  }

  test("clear() releases every entry's blocks") {
    val cache = new PipelineQueries.BoundedModelCache[DataFrame](
      PipelineQueries.releaseCheckpoint)
    val a = ckptFrame(100)
    val b = ckptFrame(101)
    cache.getOrTrain((spark, "model-cache-spec-clear", 0))(a)
    cache.getOrTrain((spark, "model-cache-spec-clear", 1))(b)
    cache.clear()
    assert(ckptLevel(a) == StorageLevel.NONE && ckptLevel(b) == StorageLevel.NONE,
      "clear() left checkpoint blocks behind")
  }
}
