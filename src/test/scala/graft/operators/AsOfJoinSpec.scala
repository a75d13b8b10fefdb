package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Backward as-of join: inclusive latest-at-or-before matching per key,
  * nulls before any right row, and plan shape (one key shuffle, no
  * nested-loop join).
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    // (trade_id, sym, t)
    (1L, "A", 10L), (2L, "A", 20L), (3L, "A", 35L),
    (4L, "B", 5L), (5L, "B", 50L))
    .toDF("trade_id", "sym", "t")

  private def quotes = Seq(
    // (sym, qt, px)
    ("A", 10L, 1.0), ("A", 25L, 2.0),
    ("B", 40L, 9.0))
    .toDF("sym", "qt", "px")

  test("latest-at-or-before per key, inclusive, null before first quote") {
    val got = AsOfJoin.backward(trades, quotes, "sym", "t", "qt", Seq("px"))
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(
      1L -> Some(1.0),  // quote at exactly t=10 matches (inclusive)
      2L -> Some(1.0),  // 25 is in the future at t=20
      3L -> Some(2.0),
      4L -> None,       // no quote at or before t=5
      5L -> Some(9.0)))
  }

  test("keys never leak matches across partitions") {
    // B's t=50 trade must see B's quote, never A's later ones
    val got = AsOfJoin.backward(trades, quotes, "sym", "t", "qt", Seq("px"))
      .filter(col("trade_id") === 5L).select("px").as[Double].head()
    assert(got == 9.0)
  }

  test("multiple value columns carry together from the same matched row") {
    val q2 = Seq(("A", 10L, 1.0, 100L), ("A", 25L, 2.0, 200L))
      .toDF("sym", "qt", "px", "size")
    val got = AsOfJoin.backward(trades.filter(col("sym") === "A"), q2,
        "sym", "t", "qt", Seq("px", "size"))
      .select("trade_id", "px", "size")
      .as[(Long, Double, Long)].collect().toSet
    assert(got == Set((1L, 1.0, 100L), (2L, 1.0, 100L), (3L, 2.0, 200L)))
  }

  test("random trades/quotes match the brute-force per-row maximum") {
    for (seed <- Seq(3, 17, 23)) {
      val rnd = new scala.util.Random(seed)
      val syms = Vector("A", "B", "C", "D")
      val tradeRows = (0 until 120).map(i =>
        (i.toLong, syms(rnd.nextInt(syms.size)), rnd.nextInt(300).toLong))
      // quotes unique per (sym, t): the operator documents arbitrary
      // tie-break among identical instants, so the generator avoids them
      val quoteRows = (0 until 80)
        .map(_ => ((syms(rnd.nextInt(syms.size)), rnd.nextInt(300).toLong), rnd.nextDouble()))
        .toMap.toSeq.map { case ((s, t), px) => (s, t, px) }
      val expected = tradeRows.map { case (id, s, t) =>
        val m = quoteRows.filter(q => q._1 == s && q._2 <= t)
        id -> (if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
      }.toMap
      val got = AsOfJoin.backward(
          tradeRows.toDF("trade_id", "sym", "t"),
          quoteRows.toDF("sym", "qt", "px"),
          "sym", "t", "qt", Seq("px"))
        .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
      assert(got == expected, s"seed $seed")
    }
  }

  test("plan: one exchange on the key, no BroadcastNestedLoopJoin") {
    val df = AsOfJoin.backward(trades, quotes, "sym", "t", "qt", Seq("px"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("null right times never match — an unparsed timestamp is not a quote") {
    // the null-time row would sort FIRST in the window frame (asc NULLS
    // FIRST) and carry 99.0 onto trades that predate every real quote
    val q = Seq((Option("A"), Option.empty[Long], 99.0),
        (Option("A"), Option(25L), 2.0))
      .toDF("sym", "qt", "px")
    val got = AsOfJoin.backward(trades, q, "sym", "t", "qt", Seq("px"))
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).isEmpty && got(2L).isEmpty, "trades before t=25 must not match")
    assert(got(3L).contains(2.0))
  }

  test("forward: earliest-at-or-after per key, inclusive, null after last quote") {
    val got = AsOfJoin.forward(trades, quotes, "sym", "t", "qt", Seq("px"))
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(
      1L -> Some(1.0),  // quote at exactly t=10 matches (inclusive)
      2L -> Some(2.0),  // next quote after t=20 is t=25
      3L -> None,       // nothing after t=35 for A
      4L -> Some(9.0),
      5L -> None))
  }

  test("forward random rows match the brute-force per-row minimum") {
    for (seed <- Seq(5, 11)) {
      val rnd = new scala.util.Random(seed)
      val syms = Vector("A", "B", "C")
      val tradeRows = (0 until 100).map(i =>
        (i.toLong, syms(rnd.nextInt(syms.size)), rnd.nextInt(300).toLong))
      val quoteRows = (0 until 60)
        .map(_ => ((syms(rnd.nextInt(syms.size)), rnd.nextInt(300).toLong), rnd.nextDouble()))
        .toMap.toSeq.map { case ((s, t), px) => (s, t, px) }
      val expected = tradeRows.map { case (id, s, t) =>
        val m = quoteRows.filter(q => q._1 == s && q._2 >= t)
        id -> (if (m.isEmpty) None else Some(m.minBy(_._2)._3))
      }.toMap
      val got = AsOfJoin.forward(
          tradeRows.toDF("trade_id", "sym", "t"),
          quoteRows.toDF("sym", "qt", "px"),
          "sym", "t", "qt", Seq("px"))
        .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
      assert(got == expected, s"seed $seed")
    }
  }

  test("nearest: min |gap| per key, ties to backward, tolerance nulls far matches") {
    // A quotes at 10 and 25; trade at 20 is 10 back / 5 forward → forward;
    // trade at 35 is 10 past 25 → backward; with tolerance 6 it nulls out
    val got = AsOfJoin.nearest(trades, quotes, "sym", "t", "qt", Seq("px"))
      .select("trade_id", "px", "asof_gap")
      .as[(Long, Option[Double], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((Some(1.0), Some(0L))), "exact-time match, gap 0")
    assert(got(2L) == ((Some(2.0), Some(5L))), "forward is closer at t=20")
    assert(got(3L) == ((Some(2.0), Some(10L))))
    assert(got(4L) == ((Some(9.0), Some(35L))))
    assert(got(5L) == ((Some(9.0), Some(10L))))
    val tol = AsOfJoin.nearest(trades, quotes, "sym", "t", "qt", Seq("px"),
        maxGap = Some(lit(6L)))
      .select("trade_id", "px", "asof_gap")
      .as[(Long, Option[Double], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(tol(2L) == ((Some(2.0), Some(5L))), "within tolerance survives")
    assert(tol(3L) == ((None, None)), "beyond tolerance nulls the match")
    assert(tol(4L) == ((None, None)))
  }

  test("nearest: equidistant candidates resolve to the backward match") {
    val q = Seq(("A", 15L, 1.0), ("A", 25L, 2.0)).toDF("sym", "qt", "px")
    val t = Seq((1L, "A", 20L)).toDF("trade_id", "sym", "t")
    val got = AsOfJoin.nearest(t, q, "sym", "t", "qt", Seq("px"))
      .select("px", "asof_gap").as[(Double, Long)].head()
    assert(got == ((1.0, 5L)), "tie must take the earlier (backward) quote")
  }

  test("nearest random rows match the brute-force min-gap reference") {
    for (seed <- Seq(7, 29)) {
      val rnd = new scala.util.Random(seed)
      val syms = Vector("A", "B", "C")
      val tradeRows = (0 until 100).map(i =>
        (i.toLong, syms(rnd.nextInt(syms.size)), rnd.nextInt(300).toLong))
      val quoteRows = (0 until 60)
        .map(_ => ((syms(rnd.nextInt(syms.size)), rnd.nextInt(300).toLong), rnd.nextDouble()))
        .toMap.toSeq.map { case ((s, t), px) => (s, t, px) }
      val expected = tradeRows.map { case (id, s, t) =>
        val m = quoteRows.filter(_._1 == s)
        if (m.isEmpty) id -> None
        else {
          val best = m.minBy(q => (math.abs(q._2 - t), q._2 >= t)) // tie → backward
          id -> Some((best._3, math.abs(best._2 - t)))
        }
      }.toMap
      val got = AsOfJoin.nearest(
          tradeRows.toDF("trade_id", "sym", "t"),
          quoteRows.toDF("sym", "qt", "px"),
          "sym", "t", "qt", Seq("px"))
        .select("trade_id", "px", "asof_gap")
        .as[(Long, Option[Double], Option[Long])].collect()
        .map { case (id, px, g) => id -> px.map(p => (p, g.get)) }.toMap
      assert(got == expected, s"seed $seed")
    }
  }
}
