package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Continuous CUSUM drift monitor (q189's streaming twin): the stored
  * day series IS the recursion state, so per-batch scoring must be
  * exactly Page's recursion, idempotent under crash-replay, and
  * independent of how days are batched together.
  */
class CusumMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val dayUs = 86400L * 1000000L
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_cusum").toString

  private def days(rows: (Long, Long)*) = rows.toDF("day_us", "cents")

  test("cusumBatch replays Page's recursion over the store; only new days return") {
    val dir = tmp() + "/days"
    // 20 on-target days: cusum stays 0, no alarm
    val base = (0 until 20).map(d0 => (d0 * dayUs, 100L))
    val first = EventStream.cusumBatch(days(base: _*), dir, 100L, 5L, 50L)
      .as[(Long, Long, Long, Long, Int, Int)].collect()
    assert(first.length == 20 && first.forall(r => r._3 == 0L && r._5 == 0))
    // 5 shifted days at 160c: +55/day above target+slack
    val shift = (20 until 25).map(d0 => (d0 * dayUs, 160L))
    val got = EventStream.cusumBatch(days(shift: _*), dir, 100L, 5L, 50L)
      .as[(Long, Long, Long, Long, Int, Int)].collect().sortBy(_._1)
    assert(got.map(_._3).toSeq == Seq(55L, 110L, 165L, 220L, 275L),
      s"high CUSUM must climb 55/day: ${got.map(_._3).toSeq}")
    assert(got.forall(_._5 == 1), "every shifted day exceeds the 50c alarm")
    assert(got.map(_._1).toSeq == shift.map(_._1), "only the batch's new days return")
  }

  test("a crash-replayed batch lands on identical CUSUMs (at-least-once)") {
    val dir = tmp() + "/days"
    val b = days((0 until 10).map(d0 => (d0 * dayUs, 100L)): _*)
    EventStream.cusumBatch(b, dir, 100L, 5L, 50L)
    EventStream.cusumBatch(b, dir, 100L, 5L, 50L) // replay re-appends
    val got = EventStream.cusumBatch(days((10L * dayUs, 160L)), dir, 100L, 5L, 50L)
      .as[(Long, Long, Long, Long, Int, Int)].collect()
    assert(got.toSeq == Seq((10L * dayUs, 160L, 55L, 0L, 1, 0)),
      s"duplicated store rows changed the recursion: ${got.toSeq}")
  }

  test("batching is invisible: incremental scores equal the all-at-once replay") {
    val series = (0 until 30).map(d0 =>
      (d0 * dayUs, if (d0 >= 18) 70L else 100L)) // a sustained sag
    val inc = tmp() + "/days"
    val all = tmp() + "/days"
    val incremental = series.grouped(7).flatMap { chunk =>
      EventStream.cusumBatch(days(chunk: _*), inc, 100L, 5L, 50L)
        .as[(Long, Long, Long, Long, Int, Int)].collect()
    }.toVector.sortBy(_._1)
    val oneShot = EventStream.cusumBatch(days(series: _*), all, 100L, 5L, 50L)
      .as[(Long, Long, Long, Long, Int, Int)].collect().toVector.sortBy(_._1)
    assert(incremental == oneShot, "batch boundaries leaked into the scores")
    // the sag alarms on the LOW side only, once accumulated past 50c
    assert(oneShot.filter(_._5 == 1).isEmpty)
    // 25c/day: day 18 reads 25, day 19 exactly 50 (not > 50), day 20 = 75 trips
    assert(oneShot.filter(_._6 == 1).map(_._1 / dayUs).toSeq == (20L to 29L).toSeq,
      "25c/day sag must trip the low alarm on its 3rd day and stay on")
  }

  test("end-to-end: daily windows close via watermark and the planted shift pages") {
    val dir = tmp()
    val alarms = scala.collection.concurrent.TrieMap.empty[Long, Long]
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val events = in.toDF()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
    val q = EventStream.startCusumMonitor(events, dir + "/days", dir + "/ckpt",
      targetCents = 100L, slackCents = 5L, alarmCents = 50L,
      onAlarm = (d0, c) => alarms.put(d0, c): Unit)
    try {
      var id = 0L
      def nid() = { id += 1; id }
      def ev(d0: Int, v: Double) =
        Event(nid(), d0 * dayUs + 3600L * 1000000L, 1L, "view", v)
      // days 0..9 on target (100c); days 10..12 shifted to 260c
      val quiet = (0 until 10).map(ev(_, 1.00))
      val shifted = (10 until 13).map(ev(_, 2.60))
      in.addData(quiet ++ shifted: _*)
      q.processAllAvailable()
      in.addData(ev(15, 1.00)) // drive the watermark past day 12
      q.processAllAvailable()
      in.addData(ev(16, 1.00)) // one more trigger finalizes emission
      q.processAllAvailable()
      assert(alarms.keySet == Set(10L, 11L, 12L).map(_ * dayUs), s"alarms: $alarms")
      assert(alarms(10L * dayUs) == 155L && alarms(12L * dayUs) == 465L)
    } finally q.stop()
  }
}
