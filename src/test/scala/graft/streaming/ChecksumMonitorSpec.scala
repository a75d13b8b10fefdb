package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q293's streaming twin: the per-column digest store must equal the
  * batch query's documents rows over any prefix/batching (commutative
  * digest sums are exactly mergeable), and the batch-id guard must
  * refuse a crash-replayed merge (addition is not idempotent).
  */
class ChecksumMonitorSpec extends SparkSpec {
  import spark.implicits._

  test("incremental digest store equals batch q293's documents rows; replay refused") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ckmon")
    val ckDir = s"$dir/store"
    val docs = graft.core.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
      .as[(Long, String, String, String, Long)].collect().toSeq
    val (h1, h2) = docs.splitAt(docs.size / 2)
    val input = MemoryStream[(Long, String, String, String, Long)]
    // ProcessingTime: the AvailableNow default terminates before a
    // MemoryStream's post-start addData is visible
    val q = CorpusIngest.startChecksumMaintenance(
      input.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"),
      ckDir, s"$dir/ckpt",
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      input.addData(h1: _*); q.processAllAvailable()
      input.addData(h2: _*); q.processAllAvailable()
      val live = CorpusIngest.checksumAudit(spark, ckDir).collect().toSeq
      val batch = graft.queries.PipelineQueries.q293(spark, sf0001)
        .filter(col("col_name").startsWith("documents."))
        .collect().toSeq
      assert(live == batch, s"live digests diverged:\n$live\nvs\n$batch")
    } finally q.stop()
    // crash-replay: fresh checkpoint restarts batch ids at 0 — the
    // guard must refuse the merge (digest addition would double-count)
    val input2 = MemoryStream[(Long, String, String, String, Long)]
    val q2 = CorpusIngest.startChecksumMaintenance(
      input2.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"),
      ckDir, s"$dir/ckpt2",
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      input2.addData(h1.take(5): _*); q2.processAllAvailable()
      val live = CorpusIngest.checksumAudit(spark, ckDir).collect().toSeq
      val batch = graft.queries.PipelineQueries.q293(spark, sf0001)
        .filter(col("col_name").startsWith("documents."))
        .collect().toSeq
      assert(live == batch, "stale batch id was merged")
    } finally q2.stop()
  }
}
