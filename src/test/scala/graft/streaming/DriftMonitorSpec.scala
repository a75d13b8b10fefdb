package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Continuous drift monitor (q68's streaming twin): per-batch PSI
  * scoring of newly closed windows against their stored predecessor,
  * and the watermarked append-mode end-to-end loop.
  */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val hourUs = 3600L * 1000000L
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_drift").toString

  private def psi(p: Seq[Double], q: Seq[Double]): Double =
    BigDecimal(p.zip(q).map { case (a, b) => (a - b) * math.log(a / b) }.sum)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def windows(rows: (Long, String, Long)*) =
    rows.toDF("win_us", "event_type", "n_events")

  test("driftPsiBatch scores new windows against the stored predecessor only") {
    val dir = tmp() + "/dist"
    // batch 1: hours 0 and 1 close together — only h1 has a predecessor
    val b1 = EventStream.driftPsiBatch(windows(
        (0L, "view", 8L), (0L, "click", 2L),
        (hourUs, "view", 5L), (hourUs, "click", 5L)), dir, hourUs)
      .as[(Long, Double, Long)].collect().map { case (w, s, n) => w -> ((s, n)) }.toMap
    assert(b1.keySet == Set(hourUs))
    assert(b1(hourUs)._1 == psi(Seq(0.5, 0.5), Seq(0.8, 0.2)))
    assert(b1(hourUs)._2 == 2L)
    // batch 2: hour 2 closes — its predecessor (h1) comes from the STORE,
    // and h1 itself must not re-score
    val b2 = EventStream.driftPsiBatch(windows(
        (2 * hourUs, "view", 8L), (2 * hourUs, "click", 2L)), dir, hourUs)
      .as[(Long, Double, Long)].collect().map { case (w, s, n) => w -> ((s, n)) }.toMap
    assert(b2.keySet == Set(2 * hourUs))
    assert(b2(2 * hourUs)._1 == psi(Seq(0.8, 0.2), Seq(0.5, 0.5)))
  }

  test("a replayed batch does not corrupt the store (foreachBatch at-least-once)") {
    val dir = tmp() + "/dist"
    val b1 = windows((0L, "view", 8L), (0L, "click", 2L),
      (hourUs, "view", 5L), (hourUs, "click", 5L))
    EventStream.driftPsiBatch(b1, dir, hourUs)
    // crash-between-append-and-commit replay: same rows append again;
    // the duplicated predecessor must NOT halve q or fan out the join
    EventStream.driftPsiBatch(b1, dir, hourUs)
    val b2 = EventStream.driftPsiBatch(windows(
        (2 * hourUs, "view", 8L), (2 * hourUs, "click", 2L)), dir, hourUs)
      .as[(Long, Double, Long)].collect()
    assert(b2.toSeq == Seq((2 * hourUs, psi(Seq(0.8, 0.2), Seq(0.5, 0.5)), 2L)))
  }

  test("identical distributions score zero drift") {
    val dir = tmp() + "/dist"
    EventStream.driftPsiBatch(windows((0L, "view", 6L), (0L, "click", 3L)), dir, hourUs)
    val got = EventStream.driftPsiBatch(windows(
        (hourUs, "view", 12L), (hourUs, "click", 6L)), dir, hourUs)
      .as[(Long, Double, Long)].collect()
    assert(got.toSeq == Seq((hourUs, 0.0, 2L)))
  }

  test("end-to-end: append-mode windows close via the watermark and alarm") {
    val dir = tmp()
    val alarms = scala.collection.concurrent.TrieMap.empty[Long, Double]
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val events = in.toDF()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withColumnRenamed("eventType", "event_type")
    val q = EventStream.startDriftMonitor(events, dir + "/dist", dir + "/ckpt",
      onAlarm = (w, s) => alarms.put(w, s): Unit)
    try {
      def ev(id: Long, h: Int, m: Int, t: String) =
        Event(id, (h * 3600L + m * 60L) * 1000000L, 1L, t, 1.0)
      // hours 0 and 1, then a far-future row to drive the watermark past
      // both (2h delay: watermark reaches h5-2h = h3)
      in.addData(ev(1, 0, 10, "view"), ev(2, 0, 20, "view"), ev(3, 0, 30, "click"),
        ev(4, 1, 10, "view"), ev(5, 1, 20, "click"), ev(6, 1, 30, "click"))
      q.processAllAvailable()
      in.addData(ev(7, 5, 0, "view"))
      q.processAllAvailable()
      in.addData(ev(8, 5, 1, "view")) // one more trigger finalizes emission
      q.processAllAvailable()
      // h0 = (view 2/3, click 1/3), h1 = (view 1/3, click 2/3): h1 alarms
      assert(alarms.contains(hourUs), s"alarms: $alarms")
      assert(alarms(hourUs) == psi(Seq(1.0 / 3, 2.0 / 3), Seq(2.0 / 3, 1.0 / 3)))
      assert(!alarms.contains(0L), "the first window has no predecessor")
    } finally q.stop()
  }

  test("value drift: stored breakpoints bucket the stream, shifted window alarms") {
    val dir = tmp()
    val alarms = scala.collection.concurrent.TrieMap.empty[Long, Double]
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val events = in.toDF()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
    // breakpoints are the STORED artifact (the batch path's order
    // statistics); one breakpoint at 10.0 → buckets b0 (<= 10), b1 (> 10)
    val q = EventStream.startValueDriftMonitor(events, Seq(10.0),
      dir + "/dist", dir + "/ckpt",
      onAlarm = (w, s) => alarms.put(w, s): Unit)
    try {
      def ev(id: Long, h: Int, m: Int, v: Double) =
        Event(id, (h * 3600L + m * 60L) * 1000000L, 1L, "x", v)
      // h0: values 2/3 low, 1/3 high; h1: 1/3 low, 2/3 high (drifted)
      in.addData(ev(1, 0, 10, 1.0), ev(2, 0, 20, 2.0), ev(3, 0, 30, 50.0),
        ev(4, 1, 10, 3.0), ev(5, 1, 20, 40.0), ev(6, 1, 30, 60.0))
      q.processAllAvailable()
      in.addData(ev(7, 5, 0, 1.0))
      q.processAllAvailable()
      in.addData(ev(8, 5, 1, 1.0)) // one more trigger finalizes emission
      q.processAllAvailable()
      assert(alarms.contains(hourUs), s"alarms: $alarms")
      assert(alarms(hourUs) == psi(Seq(1.0 / 3, 2.0 / 3), Seq(2.0 / 3, 1.0 / 3)))
      assert(!alarms.contains(0L), "the first window has no predecessor")
    } finally q.stop()
  }
}
