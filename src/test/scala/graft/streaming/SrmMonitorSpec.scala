package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q281's streaming twin: the SRM pair store must reproduce the batch
  * audit exactly over any prefix/batching, stay correct under
  * crash-replay WITHOUT a batch-id guard (set union is idempotent —
  * the KMV-store discipline), and fire onBreach only when a surface's
  * χ² crosses the critical value.
  */
class SrmMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def audit(rows: Seq[(String, Long)]) = {
    // the q281 fold over an explicit prefix, for batch-equality checks
    rows.toDF("event_type", "user_id")
      .select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type"))
      .agg(sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("user_id") % 2 =!= 0, 1L).otherwise(0L)).as("n_b"))
      .withColumn("n", col("n_a") + col("n_b"))
      .withColumn("dev_ppm", expr("abs(n_a - n_b) * 1000000 div n"))
      .withColumn("chi2_milli",
        expr("1000 * (n_a - n_b) * (n_a - n_b) div n"))
      .withColumn("srm_flag", (col("chi2_milli") > 3841L).cast("long"))
      .select("event_type", "n_a", "n_b", "n", "dev_ppm", "chi2_milli",
        "srm_flag")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
  }

  test("pair store equals the batch SRM audit over the prefix; breach fires; replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("srmmon")
    val storeDir = s"$dir/store"
    var breaches = Vector.empty[Seq[String]]
    val input = MemoryStream[(String, Long)]
    val q = EventStream.startSrmMonitor(
      input.toDF().toDF("event_type", "user_id"),
      storeDir, s"$dir/ckpt", bs => breaches :+= bs)
    // balanced surface "view" (3 even / 3 odd users), skewed surface
    // "click": 6 even users, 0 odd — chi2 = 6000 > 3841 once all land
    val b1 = Seq(("view", 2L), ("view", 4L), ("view", 6L), ("view", 1L),
      ("click", 2L), ("click", 4L), ("click", 6L))
    val b2 = Seq(("view", 3L), ("view", 5L), ("view", 2L), // 2 repeats
      ("click", 8L), ("click", 10L), ("click", 12L))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      assert(EventStream.srmAudit(spark, storeDir)
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
        == audit(b1))
      // click at 3-0 after b1: chi2 = 1000*9/3 = 3000 — no breach yet
      assert(breaches.flatten.isEmpty, s"premature breach: $breaches")
      input.addData(b2: _*); q.processAllAvailable()
      val got = EventStream.srmAudit(spark, storeDir)
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(got == audit(b1 ++ b2), s"prefix mismatch: $got")
      // click at 6-0: chi2 = 1000*36/6 = 6000 > 3841
      assert(breaches.last == Seq("click"), s"breach list: $breaches")
    } finally q.stop()
    // crash-replay: a fresh checkpoint re-delivers already-merged rows;
    // set union must leave the store unchanged (no batch-id guard)
    val input2 = MemoryStream[(String, Long)]
    val q2 = EventStream.startSrmMonitor(
      input2.toDF().toDF("event_type", "user_id"),
      storeDir, s"$dir/ckpt2", _ => ())
    try {
      input2.addData(b1: _*); q2.processAllAvailable()
      val got = EventStream.srmAudit(spark, storeDir)
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(got == audit(b1 ++ b2), "replayed batch changed the store")
    } finally q2.stop()
  }

  test("srmAudit over the full sf0.001 events equals declared q281") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("srmmon2")
    val storeDir = s"$dir/store"
    val ev = graft.core.Tables.load(spark, sf0001, "events")
      .select(col("event_type"), col("user_id"))
      .as[(String, Long)].collect().toSeq
    val (h1, h2) = ev.splitAt(ev.size / 2)
    val input = MemoryStream[(String, Long)]
    val q = EventStream.startSrmMonitor(
      input.toDF().toDF("event_type", "user_id"), storeDir, s"$dir/ckpt")
    try {
      input.addData(h1: _*); q.processAllAvailable()
      input.addData(h2: _*); q.processAllAvailable()
      val live = EventStream.srmAudit(spark, storeDir).collect().toSeq
      val batch = graft.queries.PipelineQueries.q281(spark, sf0001)
        .collect().toSeq
      assert(live == batch, "live audit diverged from declared q281")
    } finally q.stop()
  }
}
