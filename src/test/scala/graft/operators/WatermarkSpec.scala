package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Gated watermark-advance semantics (/root/reference/download/
  * routeviews.go:56-62): the new watermark is the max seqnum of the
  * prefix of successes — never at or past the first failure.
  */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def advance(rows: Seq[(Long, String, Boolean)]): Map[String, Long] =
    Watermark.gatedAdvance(
      rows.toDF("seq", "grp", "failed"),
      Seq(col("grp")), col("seq"), col("failed"))
      .select("grp", "watermark").as[(String, Long)].collect().toMap

  test("no failures: watermark = max seq") {
    assert(advance(Seq((1L, "g", false), (5L, "g", false))) == Map("g" -> 5L))
  }

  test("failure gates the advance to first_failed - 1") {
    val wm = advance(Seq(
      (1L, "g", false), (2L, "g", false), (3L, "g", true),
      (4L, "g", false), (5L, "g", true)))
    assert(wm == Map("g" -> 2L))
  }

  test("failure on the first seq: watermark stays before it") {
    assert(advance(Seq((7L, "g", true), (9L, "g", false))) == Map("g" -> 6L))
  }

  test("property: watermark equals sequential-replay watermark") {
    // Replay the reference's loop: walk seqnums ascending, advance while
    // no failure has occurred (lastErr == nil gating).
    for (seed <- 1 to 20) {
      val rnd = new Random(seed)
      val rows = (1 to rnd.nextInt(30) + 1)
        .map(i => (i.toLong, "g", rnd.nextInt(4) == 0))
      var wm = 0L; var failed = false
      rows.sortBy(_._1).foreach { case (seq, _, f) =>
        if (f) failed = true else if (!failed) wm = seq
      }
      // gatedAdvance models "first failure - 1"; the replay can only
      // differ when a success precedes the first failure non-contiguously
      val expected = rows.filter(_._3).map(_._1).minOption
        .map(f => math.min(f - 1, rows.map(_._1).max))
        .getOrElse(rows.map(_._1).max)
      assert(advance(rows) == Map("g" -> expected), s"seed=$seed")
      assert(wm <= expected, s"replay never passes the gate, seed=$seed")
    }
  }

  test("filterNew keeps strictly-greater seqnums") {
    val d = Seq(1L, 2L, 3L).toDF("seq")
    val got = Watermark.filterNew(d, col("seq"), 2L).as[Long].collect()
    assert(got.toSeq == Seq(3L))
  }
}
