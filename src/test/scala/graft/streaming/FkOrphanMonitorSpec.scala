package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q256's streaming twin: the FK-orphan monitor's store must equal the
  * batch audit over the prefix processed so far, survive crash-replay,
  * and count a NULL child key as an orphan without polluting the
  * distinct-key count (the batch query's null-safe contract).
  */
class FkOrphanMonitorSpec extends SparkSpec {
  import spark.implicits._

  test("incremental orphan store equals the batch audit over the prefix; null keys audited") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("fkmon")
    val storeDir = s"$dir/store"
    val parents = Seq(10L, 20L, 30L).toDF("pk")
    val input = MemoryStream[java.lang.Long]
    val q = EventStream.startFkOrphanMonitor(
      input.toDF().withColumnRenamed("value", "user_id"), "user_id",
      parents, storeDir, s"$dir/ckpt")
    // batch 1: 4 valid, 2 orphans of one key, 1 null-key orphan
    val b1: Seq[java.lang.Long] =
      Seq[java.lang.Long](10L, 10L, 20L, 30L, 77L, 77L, null)
    // batch 2: 2 valid, a repeat orphan key + a fresh one
    val b2: Seq[java.lang.Long] = Seq[java.lang.Long](20L, 30L, 77L, 88L)
    try {
      input.addData(b1: _*); q.processAllAvailable()
      val a1 = EventStream.fkOrphanAudit(spark, storeDir)
        .as[(Long, Long, Long, Long)].head()
      assert(a1 == ((7L, 3L, 1L, 571428L)), s"after b1: $a1")
      input.addData(b2: _*); q.processAllAvailable()
      val a2 = EventStream.fkOrphanAudit(spark, storeDir)
        .as[(Long, Long, Long, Long)].head()
      // prefix: 11 rows, 5 orphans (77 x3, 88, null), 2 distinct keys
      assert(a2 == ((11L, 5L, 2L, 545454L)), s"after b2: $a2")
      // batch-equality against the q256-shaped batch fold over the prefix
      val prefix = (b1 ++ b2).toDF("user_id")
        .select(col("user_id").cast("long").as("k"))
      val batchAudit = prefix
        .join(broadcast(parents.select(col("pk"))), col("k") === col("pk"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"),
          count(col("k")).as("n_orphan_keys_rows"),
          countDistinct(col("k")).as("n_orphan_keys"))
        .as[(Long, Long, Long)].head()
      assert(batchAudit._1 == a2._2 && batchAudit._3 == a2._3)
      // per-key store rows: 77 -> 3, 88 -> 1, null -> 1, totals 11
      val rows = spark.read.parquet(storeDir)
        .select("tot", "k", "cnt").as[(Boolean, Option[Long], Long)]
        .collect().toSet
      assert(rows == Set((true, None, 11L), (false, Some(77L), 3L),
        (false, Some(88L), 1L), (false, None, 1L)))
    } finally q.stop()
    // crash-replay: a fresh checkpoint restarts batch ids at 0 — the
    // guard must refuse the merge (addition would double-count)
    val input2 = MemoryStream[java.lang.Long]
    val q2 = EventStream.startFkOrphanMonitor(
      input2.toDF().withColumnRenamed("value", "user_id"), "user_id",
      parents, storeDir, s"$dir/ckpt2")
    try {
      input2.addData(99L); q2.processAllAvailable()
      val a3 = EventStream.fkOrphanAudit(spark, storeDir)
        .as[(Long, Long, Long, Long)].head()
      assert(a3 == ((11L, 5L, 2L, 545454L)), "stale batch id was merged")
    } finally q2.stop()
  }
}
