package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming semantics tests via MemoryStream micro-batches: tumbling
  * aggregation, in-stream dedup, and the stateful current pointer across
  * multiple batches (state survives between triggers).
  */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def us(h: Int, m: Int = 0): Long =
    (h * 3600L + m * 60L) * 1000000L // micros since epoch

  private def toDf(events: Seq[Event]) =
    events.toDF().withColumn("ts", timestamp_micros(col("tsMicros")))
      .withColumnRenamed("eventType", "event_type")

  test("tumblingCounts groups into hour windows (batch-equivalent check)") {
    val events = Seq(
      Event(1, us(0, 10), 1, "view", 1.0),
      Event(2, us(0, 50), 1, "view", 2.0),
      Event(3, us(1, 5), 2, "click", 4.0))
    val got = EventStream.tumblingCounts(toDf(events))
      .orderBy("win_us", "event_type")
      .select("win_us", "event_type", "n_events", "sum_value")
      .as[(Long, String, Long, Double)].collect()
    assert(got.toSeq == Seq(
      (us(0), "view", 2L, 3.0),
      (us(1), "click", 1L, 4.0)))
  }

  test("dedupStream drops exact duplicates within the watermark horizon") {
    val events = Seq(
      Event(1, us(0, 10), 1, "view", 1.0),
      Event(1, us(0, 10), 1, "view", 1.0), // exact duplicate delivery
      Event(2, us(0, 20), 1, "view", 1.0))
    val got = EventStream.dedupStream(toDf(events), Seq("eventId"))
    assert(got.count() == 2)
  }

  test("batch dedup twin deterministically keeps the earliest event time") {
    val events = Seq(
      Event(1, us(0, 30), 1, "view", 3.0),
      Event(1, us(0, 10), 1, "view", 1.0), // earliest → survivor
      Event(1, us(0, 20), 1, "view", 2.0))
    val got = EventStream.dedupStream(toDf(events).repartition(4), Seq("eventId"))
      .select(col("value")).as[Double].collect()
    assert(got.toSeq == Seq(1.0))
  }

  test("batch dedup twin: ties on (key, ts) break on payload; map columns tolerated") {
    // two rows tying on (key, ts) with different payloads: the
    // lexicographically-smallest orderable payload survives, every run
    val tied = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), "b", Map("x" -> 1)),
        (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), "a", Map("y" -> 2)))
      .toDF("eventId", "ts", "payload", "props") // props: MAP — not orderable
    val got = EventStream.dedupStream(tied.repartition(3), Seq("eventId"))
      .select(col("payload")).as[String].collect()
    assert(got.toSeq == Seq("a"))
  }

  test("streaming dedup is key-only: a redelivery with a different ts still drops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, us(0, 10), 1, "view", 1.0),
      Event(1, us(0, 25), 1, "view", 1.0), // same key, LATER event time
      Event(2, us(0, 20), 1, "view", 1.0))
    val q = EventStream.dedupStream(
        in.toDF().withColumn("ts", timestamp_micros(col("tsMicros"))),
        Seq("eventId"))
      .writeStream.format("memory").queryName("dedup_keyonly")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("dedup_keyonly").count() == 2)
  }

  test("file-source archive ingestion is effectively-once across restarts") {
    import java.nio.file.Files
    val in = Files.createTempDirectory("graft_stream_in").toString
    val out = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    val schema = "event_id LONG, ts TIMESTAMP, user_id LONG"

    def batch(ids: Range) = ids.map(i =>
      (i.toLong, new java.sql.Timestamp(us(i % 48) / 1000), (i % 5).toLong))
      .toDF("event_id", "ts", "user_id")

    batch(0 until 100).write.mode("append").parquet(in)
    def drain(): Unit = {
      val q = EventStream.archiveToParquet(
        spark.readStream.schema(schema).parquet(in), out, ckpt)
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() == 100)

    // restart with no new input: checkpoint prevents reprocessing
    drain()
    assert(spark.read.parquet(out).count() == 100)

    // new file: only the delta lands
    batch(100 until 150).write.mode("append").parquet(in)
    drain()
    val archived = spark.read.parquet(out)
    assert(archived.count() == 150)
    assert(archived.select("event_id").distinct().count() == 150)
    // partition columns materialized for pruning
    assert(archived.columns.toSet.intersect(Set("year", "month", "day")).size == 3)
  }

  test("tumblingCounts: streaming micro-batches equal the batch run") {
    implicit val sqlCtx = spark.sqlContext
    val events = (0 until 200).map(i =>
      Event(i.toLong, us(i % 30, i % 60), (i % 7).toLong,
        Seq("view", "click", "purchase")(i % 3), i * 0.5))
    val input = MemoryStream[Event]
    val streamDf = input.toDF()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withColumnRenamed("eventType", "event_type")
    val q = EventStream.tumblingCounts(streamDf)
      .writeStream.format("memory").queryName("tumbling_eq")
      .outputMode(OutputMode.Complete()).start()
    try {
      events.grouped(70).foreach { g => input.addData(g: _*); q.processAllAvailable() }
      val streamed = spark.table("tumbling_eq")
        .select("win_us", "event_type", "n_events", "sum_value")
        .as[(Long, String, Long, Double)].collect().toSet
      val batch = EventStream.tumblingCounts(toDf(events))
        .select("win_us", "event_type", "n_events", "sum_value")
        .as[(Long, String, Long, Double)].collect().toSet
      assert(streamed == batch) // one definition, two execution modes
    } finally q.stop()
  }

  test("startUpsertSink maintains a keyed SCD-1 table across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("upsert_sink")
    val table = s"$dir/state"
    val ckpt = s"$dir/ckpt"
    val input = MemoryStream[Event]
    val updates = input.toDF()
      .select(col("userId").as("k"), col("eventType").as("status"),
        col("value").as("v"), col("tsMicros").as("ver"))
    val q = EventStream.startUpsertSink(updates, table, ckpt,
      keys = Seq("k"), versionCols = Seq("ver"))
    try {
      // batch 1: two keys; key 2 arrives twice — the higher version wins
      input.addData(
        Event(1, 100L, 1, "a", 1.0),
        Event(2, 100L, 2, "a", 2.0),
        Event(3, 200L, 2, "b", 2.5))
      q.processAllAvailable()
      val after1 = spark.read.parquet(table).orderBy("k")
        .select("k", "status", "v").as[(Long, String, Double)].collect().toSeq
      assert(after1 == Seq((1L, "a", 1.0), (2L, "b", 2.5)))
      // batch 2: update key 1, insert key 3; key 2 untouched
      input.addData(
        Event(4, 300L, 1, "c", 9.0),
        Event(5, 300L, 3, "a", 3.0))
      q.processAllAvailable()
      val after2 = spark.read.parquet(table).orderBy("k")
        .select("k", "status", "v").as[(Long, String, Double)].collect().toSeq
      assert(after2 == Seq((1L, "c", 9.0), (2L, "b", 2.5), (3L, "a", 3.0)))
      // replay safety: re-upserting batch 2's reduction is a content no-op
      val replay = Seq((1L, "c", 9.0, 300L), (3L, "a", 3.0, 300L))
        .toDF("k", "status", "v", "ver")
      graft.operators.Merge.upsertInto(spark, table, replay, Seq("k"))
      val after3 = spark.read.parquet(table).orderBy("k")
        .select("k", "status", "v").as[(Long, String, Double)].collect().toSeq
      assert(after3 == after2)
    } finally q.stop()
  }

  test("startHeavyHittersMonitor folds per-batch sketches with undercount-only error") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("hh")
    val sketchDir = s"$dir/sketch"
    val input = MemoryStream[String]
    var updates = 0
    val q = EventStream.startHeavyHittersMonitor(
      input.toDF().withColumnRenamed("value", "term"), "term",
      sketchDir, s"$dir/ckpt", capacity = 8,
      onUpdate = _ => updates += 1)
    try {
      // batch 1: alpha dominates a 20-singleton tail (N=70, bound 7.8)
      input.addData(Seq.fill(50)("alpha") ++ (0 until 20).map(i => s"t$i"): _*)
      q.processAllAvailable()
      // batch 2: beta arrives, alpha keeps growing (N=40, bound 4.4)
      input.addData(Seq.fill(30)("beta") ++ Seq.fill(10)("alpha"): _*)
      q.processAllAvailable()
      val sk = spark.read.parquet(sketchDir).orderBy(col("est").desc)
        .select("item", "est").as[(String, Long)].collect().toSeq
      // alpha true count 60; merged undercount ≤ 70/9 + 40/9 < 13
      assert(sk.head._1 == "alpha")
      assert(sk.head._2 <= 60 && sk.head._2 >= 48)
      assert(sk.map(_._1).contains("beta"))
      assert(updates == 2)
      // the transactional guard records the last applied batch id
      assert(spark.read.parquet(sketchDir)
        .select("batch_id").head().getLong(0) == 1L)
    } finally q.stop()
  }

  test("startCountMinMonitor: incremental cell merge bit-equal to batch rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cms")
    val sketchDir = s"$dir/sketch"
    val input = MemoryStream[String]
    val q = EventStream.startCountMinMonitor(
      input.toDF().withColumnRenamed("value", "item"), "item",
      sketchDir, s"$dir/ckpt")
    val b1 = Seq.fill(40)("alpha") ++ (0 until 15).map(i => s"t$i")
    val b2 = Seq.fill(25)("beta") ++ Seq.fill(10)("alpha")
    val b3 = (0 until 15).map(i => s"t$i") ++ Seq.fill(5)("beta")
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      val stored = spark.read.parquet(sketchDir)
        .select("j", "b", "c").as[(Int, String, Long)].collect().toSet
      // batching must not matter: cellwise integer addition commutes,
      // so three merged batches == one build over the concatenation
      val rebuilt = graft.operators.CountMin.cells(
          (b1 ++ b2 ++ b3).toDF("item"), "item")
        .as[(Int, String, Long)].collect().toSet
      assert(stored == rebuilt, "incremental cells drifted from batch rebuild")
      assert(spark.read.parquet(sketchDir)
        .select("batch_id").head().getLong(0) == 2L)
      // one-sided estimates served FROM THE STORE, corpus untouched
      val est = graft.operators.CountMin.estimates(
          Seq("alpha", "beta", "t3", "ghost").toDF("item"),
          spark.read.parquet(sketchDir).select("j", "b", "c"), "item")
        .as[(String, Long)].collect().toMap
      val truth = Map("alpha" -> 50L, "beta" -> 30L, "t3" -> 2L, "ghost" -> 0L)
      truth.foreach { case (k, n) =>
        assert(est(k) >= n, s"$k: est ${est(k)} < true $n")
      }
    } finally q.stop()
    // transaction guard: a FRESH checkpoint lineage restarts batch ids at
    // 0 — merging against this store must be refused (would double-count),
    // the documented one-store-one-lineage rule
    val input2 = MemoryStream[String]
    val q2 = EventStream.startCountMinMonitor(
      input2.toDF().withColumnRenamed("value", "item"), "item",
      sketchDir, s"$dir/ckpt2")
    try {
      input2.addData("alpha"); q2.processAllAvailable()
      val after = spark.read.parquet(sketchDir)
        .select("j", "b", "c").as[(Int, String, Long)].collect().toSet
      val before = graft.operators.CountMin.cells(
          (b1 ++ b2 ++ b3).toDF("item"), "item")
        .as[(Int, String, Long)].collect().toSet
      assert(after == before, "stale batch id was merged — replay guard broken")
    } finally q2.stop()
  }

  test("stream-static enrichment joins dims per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((7L, "gold"), (8L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Event]
    val q = EventStream.enrich(
        input.toDF().withColumnRenamed("userId", "user_id"), dim, "user_id")
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(1, us(1), 7, "view", 1.0), Event(2, us(2), 8, "click", 2.0))
      q.processAllAvailable()
      val got = spark.table("enrich_test").select("eventId", "tier")
        .as[(Long, String)].collect().toSet
      assert(got == Set((1L, "gold"), (2L, "basic")))
    } finally q.stop()
  }

  test("stream-stream interval join pairs views with in-window purchases") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    def prep(m: MemoryStream[Event]) = m.toDF()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withColumnRenamed("userId", "user_id")
      .withColumnRenamed("eventId", "event_id")
    val q = EventStream.viewToPurchase(prep(views), prep(purchases))
      .writeStream.format("memory").queryName("vp_test")
      .outputMode(OutputMode.Append()).start()
    try {
      views.addData(
        Event(1, us(1, 0), 7, "view", 1.0),
        Event(2, us(3, 0), 7, "view", 1.0))
      purchases.addData(
        Event(10, us(1, 20), 7, "purchase", 5.0), // 20 min after view 1 → match
        Event(11, us(5, 0), 7, "purchase", 5.0))  // no view within 30 min
      q.processAllAvailable()
      val got = spark.table("vp_test").select("view_id", "purchase_id")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L)))
    } finally q.stop()
  }

  test("session windows run in streaming mode with watermarked state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = input.toDF()
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withColumnRenamed("userId", "user_id")
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("session_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(
        Event(1, us(1, 0), 7, "view", 1.0),
        Event(2, us(1, 20), 7, "view", 1.0),  // merges into session 1
        Event(3, us(3, 0), 7, "view", 1.0))   // > 30 min gap → new session
      q.processAllAvailable()
      val sessions = spark.table("session_test")
        .select("user_id", "n").as[(Long, Long)].collect().sorted
      assert(sessions.toSeq == Seq((7L, 1L), (7L, 2L)))
    } finally q.stop()
  }

  test("startSessionizer emits each closed session exactly once; equals the batch twin") {
    import java.nio.file.Files
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft_sess_out").toString
    val ckpt = Files.createTempDirectory("graft_sess_ckpt").toString
    val input = MemoryStream[Event]
    val q = EventStream.startSessionizer(
      input.toDF().withColumn("ts", timestamp_micros(col("tsMicros")))
        .withColumnRenamed("userId", "user_id"),
      out, ckpt, gap = "30 minutes", watermarkDelay = "1 hour")
    try {
      val live = Seq(
        Event(1, us(1, 0), 7, "view", 1.0),
        Event(2, us(1, 20), 7, "view", 1.0), // merges into session 1
        Event(3, us(3, 0), 7, "view", 1.0),  // > gap → session 2
        Event(4, us(1, 10), 8, "view", 1.0))
      input.addData(live: _*)
      q.processAllAvailable()
      // sentinel far ahead: watermark passes every live session's end
      input.addData(Event(99, us(30), 999, "view", 1.0))
      q.processAllAvailable()
      // an emitted (closed) session never re-emits, even as later
      // batches run with state for it long dropped
      input.addData(Event(100, us(31), 999, "view", 1.0))
      q.processAllAvailable()

      val got = spark.read.parquet(out)
        .filter(col("user_id") < 100)
        .select("user_id", "start_us", "n_ev", "span_us")
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      val expect = EventStream.sessionAgg( // the SHARED definition, batch-planned
          toDf(live).withColumnRenamed("userId", "user_id"))
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      assert(got === expect)
      assert(got.map(r => (r._1, r._2)).distinct.size === got.size,
        "one row per (user, session start)")
    } finally q.stop()
  }

  test("latestPerUser maintains state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStream.latestPerUser(input.toDS())
      .writeStream.format("memory").queryName("latest_test")
      .outputMode(OutputMode.Update()).start()

    try {
      input.addData(
        Event(1, us(1), 7, "view", 1.0),
        Event(2, us(2), 7, "click", 2.0),
        Event(3, us(1), 8, "view", 3.0))
      query.processAllAvailable()
      val b1 = spark.table("latest_test").as[Latest].collect()
        .groupBy(_.userId).view.mapValues(_.maxBy(_.tsMicros)).toMap
      assert(b1(7L).eventId == 2L) // newest of the two for user 7
      assert(b1(8L).eventId == 3L)

      // batch 2: an OLDER event for user 7 must NOT displace the pointer,
      // a newer one for user 8 must.
      input.addData(
        Event(4, us(0), 7, "view", 9.0),
        Event(5, us(5), 8, "purchase", 4.0))
      query.processAllAvailable()
      val rows = spark.table("latest_test").as[Latest].collect()
      // no update emitted for user 7 in batch 2 (stale event ignored)
      assert(!rows.exists(_.eventId == 4L))
      // user 8's pointer advanced
      assert(rows.exists(r => r.userId == 8L && r.eventId == 5L))
    } finally query.stop()
  }

  test("streaksLive: the final per-user snapshot equals batch q190; a replayed batch is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStream.streaksLive(input.toDS())
      .writeStream.format("memory").queryName("streaks_live")
      .outputMode(OutputMode.Update()).start()
    try {
      // replay sf0.001's real events in event-time order, three chunks
      val evs = graft.core.Tables.load(spark, sf0001, "events")
        .select(col("event_id"), unix_micros(col("ts")).as("us"),
          col("user_id"), col("event_type"), col("value"))
        .as[(Long, Long, Long, String, Double)].collect()
        .sortBy(r => (r._2, r._1))
        .map(r => Event(r._1, r._2, r._3, r._4, r._5))
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*)
        query.processAllAvailable()
      }
      // memory sink appends update rows in batch order; take per-user LAST
      val live = spark.table("streaks_live")
        .as[StreakRow].collect()
        .zipWithIndex.groupBy(_._1.userId).view
        .mapValues(_.maxBy(_._2)._1).toMap
      val batch = graft.queries.MiningQueries.q190(spark, sf0001)
        .select("user_id", "n_active_days", "n_streaks", "longest_streak")
        .as[(Long, Long, Long, Long)].collect()
      batch.foreach { case (u, a, st, lg) =>
        val r = live(u)
        assert((r.nActiveDays, r.nStreaks, r.longestStreak) == ((a, st, lg)),
          s"user $u: live (${r.nActiveDays},${r.nStreaks},${r.longestStreak}) vs batch ($a,$st,$lg)")
      }
      // crash-replay: re-feed the last chunk — every re-emitted row must
      // be identical to the pre-replay snapshot (days <= lastDay ignored)
      val before = live
      input.addData(evs.takeRight(evs.length / 3).toIndexedSeq: _*)
      query.processAllAvailable()
      val after = spark.table("streaks_live").as[StreakRow].collect()
        .zipWithIndex.groupBy(_._1.userId).view.mapValues(_.maxBy(_._2)._1).toMap
      after.foreach { case (u, r) =>
        val b = before(u)
        assert((r.nActiveDays, r.nStreaks, r.longestStreak) ==
          ((b.nActiveDays, b.nStreaks, b.longestStreak)),
          s"user $u: replayed batch changed the streak state")
      }
    } finally query.stop()
  }

  test("preferencePairsLive: the final per-user pair equals batch q248; a replayed batch emits nothing") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStream.preferencePairsLive(input.toDS())
      .writeStream.format("memory").queryName("pref_live")
      .outputMode(OutputMode.Update()).start()
    try {
      val evs = graft.core.Tables.load(spark, sf0001, "events")
        .select(col("event_id"), unix_micros(col("ts")).as("us"),
          col("user_id"), col("event_type"), col("value"))
        .as[(Long, Long, Long, String, Double)].collect()
        .sortBy(r => (r._2, r._1))
        .map(r => Event(r._1, r._2, r._3, r._4, r._5))
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*)
        query.processAllAvailable()
      }
      val live = spark.table("pref_live").as[PrefPairRow].collect()
        .zipWithIndex.groupBy(_._1.userId).view
        .mapValues(_.maxBy(_._2)._1).toMap
      val batch = graft.queries.PipelineQueries.q248(spark, sf0001)
        .select("user_id", "chosen_event", "rejected_event", "margin_cents")
        .as[(Long, Long, Long, Long)].collect()
      assert(live.keySet == batch.map(_._1).toSet,
        "twin must emit for exactly the strict-margin users")
      batch.foreach { case (u, ch, rj, m) =>
        val r = live(u)
        assert((r.chosenEvent, r.rejectedEvent, r.marginCents) == ((ch, rj, m)),
          s"user $u: live pair diverges from batch q248")
      }
      // crash-replay: max/min folds are idempotent — NOTHING is emitted
      val nRows = spark.table("pref_live").count()
      input.addData(evs.takeRight(evs.length / 3).toIndexedSeq: _*)
      query.processAllAvailable()
      assert(spark.table("pref_live").count() == nRows,
        "a replayed batch must not change state or emit")
    } finally query.stop()
  }

  test("asOfEnrich: facts pick up the latest update per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tagged]
    val q = EventStream.asOfEnrich(input.toDS())
      .writeStream.format("memory").queryName("asof_enrich")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: interleaved arrival — the fact at t=5 precedes any
      // update, the one at t=15 follows the t=10 update, and the fact
      // at exactly t=10 matches inclusively
      input.addData(
        Tagged(1L, 15L, isUpdate = false, id = 102, payload = 0),
        Tagged(1L, 10L, isUpdate = true, id = 0, payload = 1.5),
        Tagged(1L, 5L, isUpdate = false, id = 101, payload = 0),
        Tagged(1L, 10L, isUpdate = false, id = 103, payload = 0),
        Tagged(2L, 7L, isUpdate = false, id = 201, payload = 0))
      q.processAllAvailable()
      // batch 2: state carried forward; a newer update takes over; a
      // LATE update older than current state never regresses it
      input.addData(
        Tagged(1L, 20L, isUpdate = false, id = 104, payload = 0),
        Tagged(1L, 25L, isUpdate = true, id = 0, payload = 2.5),
        Tagged(1L, 30L, isUpdate = false, id = 105, payload = 0),
        Tagged(1L, 1L, isUpdate = true, id = 0, payload = 9.9), // stale
        Tagged(1L, 40L, isUpdate = false, id = 106, payload = 0))
      q.processAllAvailable()
      val got = spark.table("asof_enrich")
        .as[Enriched].collect().map(e => e.id -> e.lastPayload).toMap
      assert(got == Map(
        101L -> None, 102L -> Some(1.5), 103L -> Some(1.5), 201L -> None,
        104L -> Some(1.5), 105L -> Some(2.5), 106L -> Some(2.5)))
    } finally q.stop()
  }

  test("asOfEnrich single batch equals the batch AsOfJoin operator") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(5)
    val facts = (0 until 100).map(i =>
      Tagged(key = rnd.nextInt(4).toLong, tMicros = rnd.nextInt(500).toLong,
        isUpdate = false, id = 1000L + i, payload = 0))
    val updates = (0 until 40)
      .map(_ => ((rnd.nextInt(4).toLong, rnd.nextInt(500).toLong), rnd.nextDouble()))
      .toMap.toSeq.map { case ((k, t), p) =>
        Tagged(key = k, tMicros = t, isUpdate = true, id = 0, payload = p) }
    val input = MemoryStream[Tagged]
    val q = EventStream.asOfEnrich(input.toDS())
      .writeStream.format("memory").queryName("asof_parity")
      .outputMode(OutputMode.Append()).start()
    val streamed = try {
      input.addData(facts ++ updates: _*)
      q.processAllAvailable()
      spark.table("asof_parity").as[Enriched].collect()
        .map(e => e.id -> e.lastPayload).toMap
    } finally q.stop()
    val batch = graft.operators.AsOfJoin.backward(
        facts.map(f => (f.key, f.id, f.tMicros)).toDF("key", "id", "t"),
        updates.map(u => (u.key, u.tMicros, u.payload)).toDF("key", "ut", "payload"),
        "key", "t", "ut", Seq("payload"))
      .select("id", "payload").as[(Long, Option[Double])].collect().toMap
    assert(streamed == batch)
  }

  test("funnelProgress: stage state across batches equals the batch q87 semantics") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.funnelProgress(input.toDS())
      .writeStream.format("memory").queryName("funnel_prog")
      .outputMode(OutputMode.Update()).start()
    try {
      // batch 1, deliberately shuffled within the batch (the operator
      // sorts): user 1 view→click, user 2 click-with-no-view (gated),
      // user 3 purchase-before-click (gated), user 4 click AT the view
      // instant (strict > excludes it)
      input.addData(
        Event(3, us(2), 1, "click", 0),
        Event(1, us(1), 1, "view", 0),
        Event(4, us(1), 2, "click", 0),
        Event(5, us(1), 3, "purchase", 0),
        Event(6, us(3), 4, "view", 0),
        Event(7, us(3), 4, "click", 0))
      q.processAllAvailable()
      val b1 = spark.table("funnel_prog").as[FunnelProgress].collect()
        .groupBy(_.userId).view.mapValues(_.last).toMap
      assert(b1(1L) == FunnelProgress(1, us(1), us(2), 0))
      assert(!b1.contains(2L), "ungated click must not emit progress")
      assert(!b1.contains(3L), "ungated purchase must not emit progress")
      assert(b1(4L) == FunnelProgress(4, us(3), 0, 0),
        "click at the view instant is not AFTER the view")

      // batch 2 (event-time ordered continuation): user 1 completes the
      // funnel;
      // user 2's view arrives then a later click counts; an 'error'
      // event and a stale duplicate click for user 1 emit NOTHING new
      val before = spark.table("funnel_prog").count()
      input.addData(
        Event(8, us(4), 1, "purchase", 0),
        Event(9, us(2), 2, "view", 0),
        Event(10, us(5), 2, "click", 0),
        Event(11, us(6), 5, "error", 0))
      q.processAllAvailable()
      val b2 = spark.table("funnel_prog").as[FunnelProgress].collect()
        .groupBy(_.userId).view.mapValues(_.last).toMap
      assert(b2(1L) == FunnelProgress(1, us(1), us(2), us(4)))
      assert(b2(2L) == FunnelProgress(2, us(2), us(5), 0))
      assert(!b2.contains(5L), "a non-funnel event type must not emit")

      // batch 3: no-op events for user 1 (stage times already tighter)
      // emit no update rows at all
      val rowsBefore = spark.table("funnel_prog").count()
      input.addData(Event(12, us(9), 1, "click", 0), Event(13, us(9), 1, "view", 0))
      q.processAllAvailable()
      assert(spark.table("funnel_prog").count() == rowsBefore,
        "late looser events must not re-emit state")
      assert(before < rowsBefore)
    } finally q.stop()
  }

  test("funnelProgress: in-order replay of sf0.001 equals the batch q87 counts") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.core.Tables.load(spark, sf0001, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("tsMicros"),
        col("user_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect()
      .map { case (id, ts, u, et, v) => Event(id, ts, u, et, v) }
      .sortBy(e => (e.tsMicros, e.eventId)) // event-time-ordered feed
    val (first, second) = ev.splitAt(ev.length / 2)
    val input = MemoryStream[Event]
    val q = EventStream.funnelProgress(input.toDS())
      .writeStream.format("memory").queryName("funnel_sf")
      .outputMode(OutputMode.Update()).start()
    val streamed = try {
      input.addData(first: _*)
      q.processAllAvailable()
      input.addData(second: _*)
      q.processAllAvailable()
      spark.table("funnel_sf").as[FunnelProgress].collect()
        .groupBy(_.userId).view.mapValues(_.last).toMap
    } finally q.stop()
    val Array((nUsersWithStage, nView, nClick, nFull)) =
      graft.queries.PipelineQueries.q87(spark, sf0001)
        .as[(Long, Long, Long, Long)].collect()
    assert(streamed.values.count(_.tvMicros > 0) == nView)
    assert(streamed.values.count(_.tcMicros > 0) == nClick)
    assert(streamed.values.count(_.tpMicros > 0) == nFull)
    assert(nUsersWithStage >= streamed.size)
  }

  test("profileBatch/profileSnapshot: 3-batch replay (incl. a duplicate) equals batch q161") {
    val profDir = java.nio.file.Files.createTempDirectory("graft_prof").toString
    val ev = graft.core.Tables.load(spark, sf0001, "events")
    // three thirds by event_id, fed as batches 0/1/2 — then batch 1
    // REPLAYED verbatim (same batch id), the crash-recovery case the
    // max-dedup store read must absorb
    for (i <- 0 to 2)
      EventStream.profileBatch(ev.filter(col("event_id") % 3 === i), i, profDir)
    EventStream.profileBatch(ev.filter(col("event_id") % 3 === 1), 1, profDir)
    val got = EventStream.profileSnapshot(spark, profDir).collect().head
    val want = graft.queries.MiningQueries.q161(spark, sf0001).collect().head
    assert(got.schema.fieldNames.toSeq == want.schema.fieldNames.toSeq,
      s"profile columns differ: ${got.schema.fieldNames.toSeq}")
    assert(got.toSeq == want.toSeq,
      s"maintained profile diverged from batch q161:\n got $got\nwant $want")
  }

  test("twapDaily: watermark-closed days reproduce batch q178 exactly") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.twapDaily(input.toDS(), watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("twap_daily")
      .outputMode(OutputMode.Append()).start()
    try {
      // day 1 (epoch day 0 would collide with the INITIAL watermark,
      // which drops at-watermark rows), shuffled within the batch (the
      // operator sorts): click 1.00@00:00 + 3.00@12:00 (each holds 12h
      // -> 200c), view 2.50@06:00 (holds to midnight -> 250c)
      val dayUs = 86400L * 1000000L
      val day1 = Seq(
        Event(2, us(24 + 12), 1, "click", 3.00),
        Event(1, us(24), 1, "click", 1.00),
        Event(3, us(24 + 6), 2, "view", 2.50))
      input.addData(day1: _*)
      q.processAllAvailable()
      assert(spark.table("twap_daily").count() == 0,
        "no day may finalize before the watermark passes its midnight")
      // day-2 arrivals push the watermark past day 1's midnight...
      input.addData(Event(4, us(50), 1, "click", 5.00))
      q.processAllAvailable()
      // ...and the NEXT trigger evaluates the timeouts against it
      input.addData(Event(5, us(54), 1, "click", 7.00))
      q.processAllAvailable()
      val got = spark.table("twap_daily").as[TwapRow].collect()
        .filter(_.dayUs == dayUs).map(r => r.eventType -> r).toMap
      val h12 = 12L * 3600 * 1000000L
      assert(got("click") == TwapRow("click", dayUs, 2L,
        100L * h12 + 300L * h12, 2 * h12, 200L), s"click day: ${got.get("click")}")
      assert(got("view") == TwapRow("view", dayUs, 1L,
        250L * 18 * 3600 * 1000000L, 18L * 3600 * 1000000L, 250L),
        s"view day: ${got.get("view")}")

      // batch-equality: the SAME day-1 events through batch q178
      val dir = java.nio.file.Files.createTempDirectory("graft_twapd").toString
      day1.toDF()
        .select(col("eventId").as("event_id"),
          timestamp_micros(col("tsMicros")).as("ts"),
          col("userId").as("user_id"), col("eventType").as("event_type"),
          col("value"), lit("{}").as("props"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = graft.queries.MiningQueries.q178(spark, dir)
        .select("event_type", "n", "num", "den", "twap_cents")
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      got.foreach { case (typ, r) =>
        assert(batch(typ) == ((typ, r.n, r.num, r.den, r.twapCents)),
          s"streamed $typ day diverged from batch q178: $r vs ${batch(typ)}")
      }
    } finally q.stop()
  }

  test("ledgerLive: the final per-key snapshot equals the batch clamp fold; a replayed batch is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[graft.operators.LedgerEvent]
    val query = EventStream.ledgerLive(input.toDS(), 0L, 5000L)
      .writeStream.format("memory").queryName("ledger_live")
      .outputMode(OutputMode.Update()).start()
    try {
      val evs = graft.core.Tables.load(spark, sf0001, "events")
        .filter(col("event_type").isin("purchase", "error"))
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
          col("event_type"), round(col("value") * 100).cast("long"))
        .as[(Long, Long, Long, String, Long)].collect()
        .sortBy(r => (r._3, r._2))
        .map(r => graft.operators.LedgerEvent(r._1, r._2, r._3,
          if (r._4 == "purchase") r._5 / 10 else -(r._5 / 5)))
      val chunks = evs.grouped(math.max(1, evs.length / 3 + 1)).toSeq
      chunks.foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*)
        query.processAllAvailable()
      }
      // crash-replay: re-feed the LAST chunk — the monotone guard must no-op
      input.addData(chunks.last.toIndexedSeq: _*)
      query.processAllAvailable()
      val live = spark.table("ledger_live")
        .as[graft.operators.LedgerResult].collect()
        .zipWithIndex.groupBy(_._1.key).view.mapValues(_.maxBy(_._2)._1).toMap
      val batch = graft.queries.MiningQueries.q241(spark, sf0001)
        .as[(Long, Long, Long, Long, Long)].collect()
      assert(batch.nonEmpty)
      batch.foreach { case (u, n, bal, nc, nf) =>
        val r = live(u)
        assert((r.n_events, r.final_balance, r.n_capped, r.n_floored)
          == ((n, bal, nc, nf)),
          s"user $u: live (${r.n_events},${r.final_balance},${r.n_capped},${r.n_floored}) vs batch ($n,$bal,$nc,$nf)")
      }
    } finally query.stop()
  }

  test("retentionTailLive: the final per-user snapshot equals batch q302; a replayed batch is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStream.retentionTailLive(input.toDS(), k = 8)
      .writeStream.format("memory").queryName("tail_live")
      .outputMode(OutputMode.Update()).start()
    try {
      val evs = graft.core.Tables.load(spark, sf0001, "events")
        .select(col("event_id"), unix_micros(col("ts")).as("us"),
          col("user_id"), col("event_type"), col("value"))
        .as[(Long, Long, Long, String, Double)].collect()
        .sortBy(r => (r._2, r._1))
        .map(r => Event(r._1, r._2, r._3, r._4, r._5))
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*)
        query.processAllAvailable()
      }
      val live = spark.table("tail_live").as[TailRow].collect()
        .zipWithIndex.groupBy(_._1.user_id).view
        .mapValues(_.maxBy(_._2)._1).toMap
      val batch = graft.queries.PipelineQueries.q302(spark, sf0001)
        .as[(Long, Long, Long, Long, String, Long)].collect()
      assert(batch.nonEmpty)
      batch.foreach { case (u, nt, nk, span, sig, pur) =>
        val r = live(u)
        assert((r.n_total, r.n_kept, r.tail_span_us, r.tail_sig,
          r.tail_purchases) == ((nt, nk, span, sig, pur)),
          s"user $u: live (${r.n_total},${r.n_kept},${r.tail_span_us}," +
            s"${r.tail_sig},${r.tail_purchases}) vs batch " +
            s"($nt,$nk,$span,$sig,$pur)")
      }
      // crash-replay: re-feed the last chunk — (us, id) at or before
      // the last applied coordinates are ignored, so every re-emitted
      // row must equal the pre-replay snapshot
      val before = live
      input.addData(evs.takeRight(evs.length / 3).toIndexedSeq: _*)
      query.processAllAvailable()
      val after = spark.table("tail_live").as[TailRow].collect()
        .zipWithIndex.groupBy(_._1.user_id).view
        .mapValues(_.maxBy(_._2)._1).toMap
      after.foreach { case (u, r) =>
        assert(r == before(u), s"user $u: replayed batch changed the tail")
      }
    } finally query.stop()
  }
}
