package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Overlap-bin range join: exact point-in-interval semantics (matches
  * the naive BETWEEN crossjoin on every case), exactly-once pair
  * emission across bin boundaries, and the equi-join plan shape.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches the naive BETWEEN crossjoin across bin widths") {
    val rnd = new scala.util.Random(7)
    val points = (0L until 200L).map(i => (i, rnd.nextInt(1000).toLong))
      .toDF("pid", "p")
    val intervals = (0L until 60L).map { i =>
      val s = rnd.nextInt(950).toLong
      (i, s, s + rnd.nextInt(120).toLong)
    }.toDF("iid", "s", "e")
    val naive = points.crossJoin(intervals)
      .filter(col("p") >= col("s") && col("p") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (bw <- Seq(1L, 7L, 64L, 1000L, 5000L)) {
      val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", bw)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at binWidth=$bw")
      assert(got.toSet == naive, s"wrong pair set at binWidth=$bw")
    }
  }

  test("interval spanning many bins still emits each contained point once") {
    val points = Seq((1L, 0L), (2L, 500L), (3L, 999L), (4L, 1001L)).toDF("pid", "p")
    val intervals = Seq((10L, 0L, 1000L)).toDF("iid", "s", "e") // spans 101 bins at bw=10
    val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 10L)
      .select("pid").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L)) // 1001 is outside (inclusive end 1000)
  }

  test("negative domains bin correctly (floor, not truncation)") {
    val points = Seq((1L, -15L), (2L, -5L), (3L, 5L)).toDF("pid", "p")
    val intervals = Seq((10L, -12L, -1L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 10L)
      .select("pid").as[Long].collect().sorted
    assert(got.toSeq == Seq(2L))
  }

  test("plan: equi-join on the bin key, no BroadcastNestedLoopJoin") {
    val points = (0L until 100L).map(i => (i, i * 3)).toDF("pid", "p")
    val intervals = (0L until 20L).map(i => (i, i * 10, i * 10 + 9)).toDF("iid", "s", "e")
    val df = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 16L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("an open-ended sentinel interval fails loudly, naming the bounds") {
    // one corrupt row must surface as a NAMED data error, not an opaque
    // "too long sequence" from a billions-element explode
    val points = Seq((1L, 50L)).toDF("pid", "p")
    val intervals = Seq((1L, 0L, Long.MaxValue)).toDF("iid", "s", "e")
    val e = intercept[Exception](
      RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 3600L).count())
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + messages(t.getCause)
    assert(messages(e).contains("pointInInterval"), messages(e))
    // the full-sentinel pair [Long.MinValue, Long.MaxValue]: a Long
    // span subtraction would overflow NEGATIVE and slip past the guard
    val sentinel = Seq((1L, Long.MinValue, Long.MaxValue)).toDF("iid", "s", "e")
    val e2 = intercept[Exception](
      RangeJoin.pointInInterval(points, sentinel, "p", "s", "e", 1L).count())
    assert(messages(e2).contains("pointInInterval"), messages(e2))
  }
}
