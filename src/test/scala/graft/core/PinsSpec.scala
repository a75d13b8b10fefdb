package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

/** Query-scoped checkpoint pins must free at the driver's release
  * boundary: results stay readable until [[Pins.release]] and the
  * blocks vanish after it. (DedupClustersSpec covers the in-loop
  * frees — its chain fixtures force multiple superseded rounds and
  * collect the final labels afterwards.)
  */
class PinsSpec extends SparkSpec {

  private def level(df: DataFrame): StorageLevel =
    df.queryExecution.analyzed.collectLeaves().collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.getStorageLevel
    }.getOrElse(fail("not a checkpointed frame"))

  test("pinned frames are readable before release and freed after") {
    import spark.implicits._
    Pins.release() // isolate from pins left by other suites
    val a = Pins.pin(Seq(1, 2, 3).toDF("v"))
    val b = Pins.pin(Seq(4).toDF("v"))
    assert(a.count() == 3 && b.count() == 1, "pinned frame unreadable")
    assert(level(a) != StorageLevel.NONE)
    Pins.release()
    assert(level(a) == StorageLevel.NONE && level(b) == StorageLevel.NONE,
      "release left pin blocks behind")
    // the queue drained: a second release is a no-op, not a double-free
    Pins.release()
  }
}
