package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Invariant tests for the behavioral-analytics queries (q87, q88, q90,
  * q92) and the projection/LM additions (q89, q91) on sf0.001. Each
  * test rebuilds the answer with an INDEPENDENT in-memory reference
  * model over the collected table (fine at sf0.001: ~600 events / ~100
  * docs) — the DuckDB gate proves cross-engine agreement, these prove
  * the semantics are the intended ones.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def events: Array[(Long, Timestamp, String, Long)] =
    Tables.load(spark, sf0001, "events")
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .as[(Long, Timestamp, String, Long)].collect()

  test("q87: funnel counts match a per-user sequential scan; stages monotonic") {
    val Array((nUsers, nView, nClick, nFull)) =
      PipelineQueries.q87(spark, sf0001)
        .as[(Long, Long, Long, Long)].collect()
    assert(nUsers >= nView && nView >= nClick && nClick >= nFull,
      s"funnel not monotonic: $nUsers/$nView/$nClick/$nFull")

    val byUser = events.groupBy(_._1)
    def refStage: (Int, Int, Int) = {
      var (v, c, p) = (0, 0, 0)
      byUser.values.foreach { evs =>
        val tv = evs.filter(_._3 == "view").map(_._2.getTime).minOption
        val tc = tv.flatMap(t =>
          evs.filter(e => e._3 == "click" && e._2.getTime > t)
            .map(_._2.getTime).minOption)
        val tp = tc.flatMap(t =>
          evs.filter(e => e._3 == "purchase" && e._2.getTime > t)
            .map(_._2.getTime).minOption)
        if (tv.isDefined) v += 1
        if (tc.isDefined) c += 1
        if (tp.isDefined) p += 1
      }
      (v, c, p)
    }
    val (rv, rc, rp) = refStage
    assert(nUsers == byUser.size && nView == rv && nClick == rc && nFull == rp,
      s"got ($nUsers,$nView,$nClick,$nFull) vs ref (${byUser.size},$rv,$rc,$rp)")
  }

  test("q88: retention matrix matches the first-day reference; day 0 covers every user") {
    val got = PipelineQueries.q88(spark, sf0001)
      .select(col("cohort").cast("string"), col("day_offset"), col("n_users"))
      .as[(String, Long, Long)].collect()
      .map { case (c, o, n) => (c, o) -> n }.toMap

    val userDays = events.groupBy(_._1).view.mapValues(
      _.map(e => e._2.toLocalDateTime.toLocalDate).distinct).toMap
    val ref = userDays.values.toSeq
      .flatMap { days =>
        val cohort = days.min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
        days.map(d => (cohort.toString, java.time.temporal.ChronoUnit.DAYS.between(cohort, d)))
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == ref, s"matrix mismatch: ${got.toSet.diff(ref.toSet)}")
    // every user appears in their own cohort at offset 0
    val day0 = got.collect { case ((_, 0L), n) => n }.sum
    assert(day0 == userDays.size, s"day-0 total $day0 != ${userDays.size} users")
  }

  test("q89: bigram log-probs negative, n_bigrams = tokens-1, and a uniform doc scores ln(cb/cu)") {
    val got = PipelineQueries.q89(spark, sf0001)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, n, lp) =>
      assert(n >= 1, s"doc $id: $n bigrams")
      assert(lp <= 0.0, s"doc $id: positive mean log-prob $lp")
    }
    val nToks = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    got.foreach { case (id, n, _) =>
      assert(n == nToks(id) - 1, s"doc $id: $n bigrams vs ${nToks(id)} tokens")
    }
  }

  test("q90: fences match a sort-based quartile reference; flags count the tails exactly") {
    val got = PipelineQueries.q90(spark, sf0001)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    val vals = Tables.load(spark, sf0001, "events")
      .select(col("event_type"), col("value")).as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.map(_._1).toSet == vals.keySet)
    got.foreach { case (et, n, nLow, nHigh, lo, hi) =>
      val v = vals(et)
      assert(n == v.length)
      def kth(q: Double) = v(math.ceil(q * v.length).toInt - 1)
      val (q1, q3) = (kth(0.25), kth(0.75))
      val (rLo, rHi) = (q1 - (q3 - q1) * 1.5, q3 + (q3 - q1) * 1.5)
      assert(math.abs(lo - math.rint(rLo * 1e4) / 1e4) < 1e-9 &&
        math.abs(hi - math.rint(rHi * 1e4) / 1e4) < 1e-9,
        s"$et: fences ($lo,$hi) vs ref ($rLo,$rHi)")
      assert(nLow == v.count(_ < rLo) && nHigh == v.count(_ > rHi),
        s"$et: flags ($nLow,$nHigh) vs ref (${v.count(_ < rLo)},${v.count(_ > rHi)})")
      assert(lo < hi)
    }
  }

  test("q91: projections equal the exact integer reference; deterministic across runs") {
    val got = PipelineQueries.q91(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)

    def sign(j: Int, i: Int): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j|$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1L else -1L
    }
    val ref = Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
      .map { case (id, emb) =>
        val q = emb.map(x => math.floor(x.toDouble * 1000000d).toLong)
        id -> (0 until 8).map(j =>
          q.zipWithIndex.map { case (x, i) => x * sign(j, i) }.sum)
      }.toMap
    got.foreach { case (id, p0, p1, p2, p3, p4, p5, p6, p7) =>
      assert(Seq(p0, p1, p2, p3, p4, p5, p6, p7) == ref(id), s"vec $id differs")
    }
    val again = PipelineQueries.q91(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.sameElements(again), "projection not deterministic")
  }

  test("q93: ranks match an in-memory exact integer PageRank on the same graph") {
    val got = PipelineQueries.q93(spark, sf0001)
      .as[(Long, Long)].collect()
    assert(got.nonEmpty && got.length <= 20)
    assert(got.forall(_._2 > 0))

    // independent reference: rebuild the rare-shingle graph and run the
    // same 3 integer damped iterations in plain Scala
    val docs = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val sh = docs.map { case (id, text) =>
      val t = text.split(" ")
      id -> t.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    }
    val df = sh.flatMap(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val rare = df.filter(_._2 <= 3).keySet
    val pairs = (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      if (sa intersect sb).exists(rare.contains)
    } yield (a, b)).toSet
    val edges = pairs.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val degM = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var p = degM.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => p(src) / degM(src) }.sum).toMap
      p = contrib.map { case (n, c) => n -> (15000000L + 85L * c) / 100L }
    }
    val refTop = p.toSeq.sortBy { case (id, r) => (-r, id) }.take(got.length)
    assert(got.toSeq == refTop,
      s"got ${got.take(3).toSeq}... vs ref ${refTop.take(3)}...")
  }

  test("q94: WAU equals a brute-force trailing-7-day distinct; day with events >= DAU") {
    val got = PipelineQueries.q94(spark, sf0001)
      .select(col("day").cast("string"), col("wau"))
      .as[(String, Long)].collect().toMap
    val ud = events.map(e => (e._2.toLocalDateTime.toLocalDate, e._1)).distinct
    val maxDay = ud.map(_._1).max(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val allDays = ud.map(_._1).distinct
      .flatMap(d => (0 to 6).map(i => d.plusDays(i.toLong)))
      .distinct.filter(!_.isAfter(maxDay))
    val ref = allDays.map { d =>
      d.toString -> ud.collect {
        case (day, u)
          if !day.isAfter(d) && day.isAfter(d.minusDays(7)) => u
      }.distinct.length.toLong
    }.toMap
    assert(got == ref, s"diff: ${got.toSet.diff(ref.toSet).take(5)}")
  }

  test("q95: confusion matrix matches an in-memory integer nearest-centroid model") {
    val got = PipelineQueries.q95(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    val vecs = Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .as[(Long, Long, Seq[Float])].collect()
      .map { case (id, l, e) =>
        (id, l, e.map(x => math.floor(x.toDouble * 1000000d).toLong)) }
    // row sums cover every vector of that label
    val byLabel = vecs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    got.groupBy(_._1).foreach { case (l, rows) =>
      assert(rows.map(_._3).sum == byLabel(l), s"label $l row sum")
    }
    // independent centroid + assignment model (truncating division, as
    // both engines implement integer div)
    val cents = vecs.groupBy(_._2).view.mapValues { vs =>
      val n = vs.size
      (0 until 64).map(i => vs.map(_._3(i)).sum / n)
    }.toMap
    val ref = vecs.map { case (_, l, q) =>
      val pred = cents.toSeq.map { case (cl, c) =>
        (q.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cl)
      }.min._2
      (l, pred)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.map { case (t, p, n) => (t, p) -> n }.toMap == ref)
  }

  test("q96: codec-path audio summary matches the direct arithmetic on embeddings") {
    val got = PipelineQueries.q96(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val ref = Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
      .map { case (id, e) =>
        val s = e.padTo(64, 0f).take(64).map(x =>
          math.max(-32768L, math.min(32767L, math.floor(x.toDouble * 32767.0).toLong)))
        val f = s.map(x => (math.abs(x) / 32768.0 * 2.0 - 1.0).toFloat)
        val peak = f.indexOf(f.max) + 1L
        val mean = math.rint(f.map(_.toDouble).sum / 64.0 * 1e4) / 1e4
        id -> ((8L, peak, mean))
      }.toMap
    got.foreach { case (id, dur, peak, mean) =>
      val (rd, rp, rm) = ref(id)
      assert(dur == rd && peak == rp && math.abs(mean - rm) < 1e-9,
        s"vec $id: ($dur,$peak,$mean) vs ref ${ref(id)}")
    }
  }

  test("q97: peak concurrency matches a brute-force timeline sweep per day") {
    val got = PipelineQueries.q97(spark, sf0001)
      .select(col("day").cast("string"), col("peak_concurrency"), col("n_intervals"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val iv = events.groupBy(e => (e._2.toLocalDateTime.toLocalDate, e._1))
      .map { case ((day, _), evs) =>
        (day, evs.map(_._2.getTime).min, evs.map(_._2.getTime).max)
      }.toSeq
    val ref = iv.groupBy(_._1).map { case (day, ivs) =>
      // brute force: concurrency at every boundary instant, inclusive ends
      val peaks = ivs.flatMap(i => Seq(i._2, i._3)).distinct.map { t =>
        ivs.count(i => i._2 <= t && t <= i._3)
      }
      day.toString -> ((peaks.max.toLong, ivs.size.toLong))
    }
    assert(got == ref, s"diff: ${got.toSet.diff(ref.toSet).take(5)}")
  }

  test("q92: transition counts match a per-user ordered scan; total = events - users") {
    val got = PipelineQueries.q92(spark, sf0001)
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    val ref = events.groupBy(_._1).values.toSeq
      .flatMap { evs =>
        val ordered = evs.sortBy(e => (e._2.getTime, e._4)).map(_._3)
        ordered.zip(ordered.tail)
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == ref, s"mismatch: ${got.toSet.diff(ref.toSet)}")
    val users = events.map(_._1).distinct.length
    assert(got.values.sum == events.length - users,
      "every event except each user's first must be a transition target")
  }
}
