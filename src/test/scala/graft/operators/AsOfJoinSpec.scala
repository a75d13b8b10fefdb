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
}
