package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q282's streaming twin: the per-dimension moment store must make the
  * audit bit-equal to the declared batch query over any prefix and any
  * batching (moments are exactly mergeable), and the batch-id guard
  * must refuse a crash-replayed merge (addition is not idempotent).
  */
class IsotropyMonitorSpec extends SparkSpec {
  import spark.implicits._

  test("incremental moment store equals batch q282 over the full corpus; replay refused") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("isomon")
    val statsDir = s"$dir/store"
    val vecs = graft.core.Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val (h1, h2) = vecs.splitAt(vecs.size / 2)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = VectorIngest.startIsotropyMonitor(
      input.toDF().toDF("vec_id", "embedding"), statsDir, s"$dir/ckpt")
    try {
      input.addData(h1: _*); q.processAllAvailable()
      input.addData(h2: _*); q.processAllAvailable()
      val live = VectorIngest.isotropyAudit(spark, statsDir).collect().toSeq
      val batch = graft.queries.PipelineQueries.q282(spark, sf0001)
        .collect().toSeq
      assert(live == batch, s"live audit diverged: $live vs $batch")
    } finally q.stop()
    // crash-replay: a fresh checkpoint restarts batch ids at 0 — the
    // guard must refuse the merge (moment addition would double-count)
    val input2 = MemoryStream[(Long, Seq[Float])]
    val q2 = VectorIngest.startIsotropyMonitor(
      input2.toDF().toDF("vec_id", "embedding"), statsDir, s"$dir/ckpt2")
    try {
      input2.addData(h1.take(3): _*); q2.processAllAvailable()
      val live = VectorIngest.isotropyAudit(spark, statsDir).collect().toSeq
      val batch = graft.queries.PipelineQueries.q282(spark, sf0001)
        .collect().toSeq
      assert(live == batch, "stale batch id was merged")
    } finally q2.stop()
  }

  test("onCollapse pages when the participation ratio sinks under the floor") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("isomon2")
    var pages = Vector.empty[Long]
    // an axis-collapsed stream: all variance lives in coordinate 0
    // (every other dimension constant) — the DIAGONAL participation
    // ratio q282 measures reads ~100 centi (one effective dimension),
    // under any sane floor
    val collapsed = (1 to 40).map { k =>
      val v = ((k % 9).toFloat / 3f) +: Seq.fill(63)(0.5f)
      (k.toLong, v: Seq[Float])
    }
    val input = MemoryStream[(Long, Seq[Float])]
    val q = VectorIngest.startIsotropyMonitor(
      input.toDF().toDF("vec_id", "embedding"),
      s"$dir/store", s"$dir/ckpt", prCentiFloor = 200L, pages :+= _)
    try {
      input.addData(collapsed: _*); q.processAllAvailable()
      assert(pages.nonEmpty && pages.head < 200L,
        s"collapsed stream did not page: $pages")
    } finally q.stop()
  }
}
