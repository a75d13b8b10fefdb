package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Continuous EWMA control chart (q205's streaming twin): the stored
  * (type, day) series IS the chart state, so per-batch scoring must
  * replay the exact dyadic 16-lag kernel, be idempotent under
  * crash-replay, batch-boundary-invisible, and — the twin contract —
  * equal batch q205 run over the processed prefix.
  */
class EwmaMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val dayUs = 86400L * 1000000L
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ewma_tw").toString

  private def days(rows: (String, Long, Long)*) =
    rows.toDF("event_type", "day_us", "cents")

  test("ewmaBatch replays the dyadic kernel over the store; a planted spike alarms; replay is a no-op") {
    val dir = tmp() + "/days"
    // 20 flat days at 1000c — prediction equals the level, no alarm
    val flat = (0 until 20).map(d0 => ("click", d0 * dayUs, 1000L))
    val first = EventStream.ewmaBatch(days(flat: _*), dir)
      .as[(String, Long, Long, Long, Int)].collect()
    assert(first.length == 19, "the head row (no lags) is excluded by den > 0")
    assert(first.forall(r => r._4 == 1000L && r._5 == 0),
      s"flat history must predict the level everywhere: ${first.take(3).mkString(",")}")
    // crash-replay the same closed batch: the max-dedup store must not move
    EventStream.ewmaBatch(days(flat: _*), dir)
    // a 50x spike day alarms with the flat-history prediction intact
    val got = EventStream.ewmaBatch(days(("click", 20L * dayUs, 50000L)), dir)
      .as[(String, Long, Long, Long, Int)].collect()
    assert(got.toSeq == Seq(("click", 20L * dayUs, 50000L, 1000L, 1)),
      s"spike day: ${got.toSeq}")
  }

  test("batching is invisible, and the twin equals batch q205 over the processed prefix") {
    // derive the (type, day, cents) series exactly as the monitor's
    // windowed fold writes it, from real sf0.001 events
    val series = Tables.load(spark, sf0001, "events")
      .groupBy(col("event_type"),
        (expr("unix_micros(ts) div 1000000") - pmod(expr("unix_micros(ts) div 1000000"), lit(86400L)))
          .as("day_s"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .select(col("event_type"), (col("day_s") * 1000000L).as("day_us"), col("cents"))
      .as[(String, Long, Long)].collect().sortBy(r => (r._2, r._1))
    val inc = tmp() + "/days"
    val all = tmp() + "/days"
    val incremental = series.grouped(40).flatMap { chunk =>
      EventStream.ewmaBatch(days(chunk.toSeq: _*), inc)
        .as[(String, Long, Long, Long, Int)].collect()
    }.toVector.sortBy(r => (r._1, r._2))
    val oneShot = EventStream.ewmaBatch(days(series.toSeq: _*), all)
      .as[(String, Long, Long, Long, Int)].collect().toVector.sortBy(r => (r._1, r._2))
    assert(incremental == oneShot, "batch boundaries leaked into the chart")
    // twin contract: identical rows to batch q205 on the same data
    // (q205 keys by calendar day; UTC session timezone makes
    // to_date(ts) the same day the epoch-floor fold lands on)
    val batch = graft.queries.MiningQueries.q205(spark, sf0001)
      .select(col("event_type"),
        (unix_date(col("day")).cast("long") * 86400L * 1000000L).as("day_us"),
        col("x_cents"), col("ewma_c"), col("alarm"))
      .as[(String, Long, Long, Long, Int)].collect().toVector.sortBy(r => (r._1, r._2))
    graft.core.Pins.release()
    assert(oneShot == batch, s"twin != batch q205: ${
      oneShot.zip(batch).collectFirst { case (a, b) if a != b => (a, b) }}")
  }

  test("end-to-end: daily windows close via watermark and the planted spike pages") {
    val dir = tmp()
    val alarms = scala.collection.concurrent.TrieMap.empty[Long, Long]
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val events = in.toDF()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withColumnRenamed("eventType", "event_type")
    val q = EventStream.startEwmaMonitor(events, dir + "/days", dir + "/ckpt",
      onAlarm = (_, d0, c) => alarms.put(d0, c): Unit)
    try {
      var id = 0L
      def nid() = { id += 1; id }
      def ev(d0: Int, v: Double) =
        Event(nid(), d0 * dayUs + 3600L * 1000000L, 1L, "view", v)
      val quiet = (0 until 10).map(ev(_, 1.00))
      in.addData(quiet :+ ev(10, 40.0): _*)
      q.processAllAvailable()
      in.addData(ev(12, 1.00)) // watermark past day 10
      q.processAllAvailable()
      in.addData(ev(13, 1.00))
      q.processAllAvailable()
      assert(alarms.keySet == Set(10L * dayUs), s"alarms: $alarms")
      assert(alarms(10L * dayUs) == 4000L)
    } finally q.stop()
  }
}
