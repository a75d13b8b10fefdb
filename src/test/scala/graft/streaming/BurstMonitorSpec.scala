package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Continuous burst monitor (q113's streaming twin): per-batch z-scoring
  * of newly closed hours against the trailing-24h counts in the store,
  * replay safety of the store, and the watermarked end-to-end loop.
  */
class BurstMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val hourUs = 3600L * 1000000L
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_burst").toString

  private def hours(rows: (Long, Long)*) = rows.toDF("win_us", "n_events")

  // alternating 4/6 counts: mean 5, variance exactly 1 — a baseline with
  // zero variance is (correctly) unscoreable, so the fixtures avoid it
  private def baseline(n: Int): Seq[(Long, Long)] =
    (0 until n).map(h => (h * hourUs, if (h % 2 == 0) 4L else 6L))

  test("burstBatch scores batch hours against trailing store history") {
    val dir = tmp() + "/hours"
    // 24 baseline hours close first (none scoreable: the earliest have
    // too little history; none reach z ≥ 3 anyway)
    EventStream.burstBatch(hours(baseline(24): _*), dir)
    // hour 24 spikes to 50: history = 24 rows, s=120, ssq=624 → var 1,
    // mean 5, z = 45
    val got = EventStream.burstBatch(hours((24L * hourUs, 50L)), dir)
      .as[(Long, Long, Double, Double, Int)].collect()
    assert(got.toSeq == Seq((24L * hourUs, 50L, 5.0, 45.0, 1)))
  }

  test("hours closing in the same batch see each other as history") {
    val dir = tmp() + "/hours"
    EventStream.burstBatch(hours(baseline(24): _*), dir)
    // hours 24 and 25 close TOGETHER; hour 25's baseline must include
    // hour 24's spike (it is a strictly earlier clock hour)
    val got = EventStream.burstBatch(
        hours((24L * hourUs, 50L), (25L * hourUs, 5L)), dir)
      .as[(Long, Long, Double, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(24L * hourUs)._5 == 1)
    // hour 25's window covers hours 1..24: 11 fours, 12 sixes, one 50
    val h = (1 to 23).map(i => if (i % 2 == 0) 4L else 6L) :+ 50L
    val mean = h.sum.toDouble / h.size
    assert(got(25L * hourUs)._3 ==
      BigDecimal(mean).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(25L * hourUs)._5 == 0, "a return to baseline must not alarm")
  }

  test("a replayed batch does not inflate the baseline (at-least-once)") {
    val dir = tmp() + "/hours"
    val b = hours(baseline(24): _*)
    EventStream.burstBatch(b, dir)
    EventStream.burstBatch(b, dir) // crash-replay: identical rows re-append
    val got = EventStream.burstBatch(hours((24L * hourUs, 50L)), dir)
      .as[(Long, Long, Double, Double, Int)].collect()
    // duplicated history must not change mean (5.0) or count (24)
    assert(got.toSeq == Seq((24L * hourUs, 50L, 5.0, 45.0, 1)))
  }

  test("seasonalBatch scores against same-hour-of-day history, strictly earlier") {
    val dir = tmp() + "/hours"
    // 10 days: hod 5 alternates 4/6 by day (mean 5, var 1); every other
    // hod is constant 2 (variance 0 → correctly unscoreable)
    val history = for (d <- 0 until 10; h <- 0 until 24) yield
      (((d * 24 + h).toLong) * hourUs, if (h == 5) { if (d % 2 == 0) 4L else 6L } else 2L)
    EventStream.seasonalBatch(hours(history: _*), dir)
    val got = EventStream.seasonalBatch(
        hours(((10L * 24 + 5) * hourUs, 50L), ((10L * 24 + 3) * hourUs, 2L)), dir)
      .as[(Long, Int, Long, Double, Double, Int)].collect()
    // hod 3's baseline has zero variance → no row; hod 5: mean 5, z 45
    assert(got.toSeq == Seq(((10L * 24 + 5) * hourUs, 5, 50L, 5.0, 45.0, 1)))
  }

  test("burst and seasonal monitors share one store: double append is harmless") {
    val dir = tmp() + "/hours"
    val b = hours(baseline(24): _*)
    EventStream.burstBatch(b, dir)    // burst monitor's append
    EventStream.seasonalBatch(b, dir) // seasonal monitor re-appends the same rows
    val got = EventStream.burstBatch(hours((24L * hourUs, 50L)), dir)
      .as[(Long, Long, Double, Double, Int)].collect()
    // max-dedup on read: the duplicated rows change neither mean nor count
    assert(got.toSeq == Seq((24L * hourUs, 50L, 5.0, 45.0, 1)))
  }

  test("end-to-end: watermark closes hours, only the planted burst alarms") {
    val dir = tmp()
    val alarms = scala.collection.concurrent.TrieMap.empty[Long, Double]
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val events = in.toDF()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
    val q = EventStream.startBurstMonitor(events, dir + "/hours", dir + "/ckpt",
      onAlarm = (w, z) => alarms.put(w, z): Unit)
    try {
      def ev(id: Long, h: Int, m: Int) =
        Event(id, (h * 3600L + m * 60L) * 1000000L, 1L, "view", 1.0)
      var id = 0L
      def nid() = { id += 1; id }
      // hours 0..23 alternate 1 and 3 events (mean 2, variance 1);
      // hour 24 carries a 30-event burst (z = 28)
      val quiet = (0 until 24).flatMap { h =>
        (0 until (if (h % 2 == 0) 1 else 3)).map(m => ev(nid(), h, m))
      }
      val burst = (0 until 30).map(m => ev(nid(), 24, m))
      in.addData(quiet ++ burst: _*)
      q.processAllAvailable()
      in.addData(ev(nid(), 30, 0)) // drive the watermark past hour 24
      q.processAllAvailable()
      in.addData(ev(nid(), 30, 1)) // one more trigger finalizes emission
      q.processAllAvailable()
      assert(alarms.keySet == Set(24L * hourUs), s"alarms: $alarms")
      assert(alarms(24L * hourUs) == 28.0)
    } finally q.stop()
  }
}
