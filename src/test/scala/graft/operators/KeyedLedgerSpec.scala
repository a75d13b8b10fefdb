package graft.operators

import graft.SparkSpec

import scala.util.Random

/** The clamped sequential fold: planted cap/floor geometry, a
  * randomized naive-replay property, and partitioning-independence —
  * the determinism the (ts, seq) total order promises.
  */
class KeyedLedgerSpec extends SparkSpec {
  import spark.implicits._

  private def naive(rows: Seq[LedgerEvent], lo: Long, hi: Long)
      : Map[Long, (Long, Long, Long, Long)] =
    rows.groupBy(_.key).view.mapValues { g =>
      var bal = 0L; var nc = 0L; var nf = 0L
      g.sortBy(e => (e.tsUs, e.seq)).foreach { e =>
        val raw = bal + e.delta
        if (raw > hi) { bal = hi; nc += 1 }
        else if (raw < lo) { bal = lo; nf += 1 }
        else bal = raw
      }
      (g.size.toLong, bal, nc, nf)
    }.toMap

  test("planted cap and floor hits count exactly; order is (ts, seq)") {
    // key 1: +30 (cap at 20, nc=1), -50 (floor at 0, nf=1), +5 -> 5
    // key 2: same-instant ties resolve by seq: +10 (seq 1) then -30 (seq 2)
    val rows = Seq(
      LedgerEvent(1L, 1L, 100L, 30L), LedgerEvent(1L, 2L, 200L, -50L),
      LedgerEvent(1L, 3L, 300L, 5L),
      LedgerEvent(2L, 2L, 100L, -30L), LedgerEvent(2L, 1L, 100L, 10L))
    val got = KeyedLedger.cappedBalance(rows.toDS(), 0L, 20L)
      .collect().map(r => r.key -> ((r.n_events, r.final_balance, r.n_capped, r.n_floored)))
      .toMap
    assert(got(1L) == ((3L, 5L, 1L, 1L)), s"key 1: ${got(1L)}")
    // key 2: seq 1 first (+10 -> 10), then -30 -> floor 0, nf=1
    assert(got(2L) == ((2L, 0L, 0L, 1L)), s"tie order by seq: ${got(2L)}")
  }

  test("randomized corpora match the naive fold under any partitioning") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val rows = (0 until 500).map { i =>
        LedgerEvent(rnd.nextInt(7).toLong, i.toLong,
          rnd.nextInt(20).toLong, (rnd.nextInt(41) - 20).toLong)
      }
      val expect = naive(rows, -15L, 15L)
      for (parts <- Seq(1, 3, 32)) {
        val got = KeyedLedger.cappedBalance(
            rows.toDS().repartition(parts), -15L, 15L)
          .collect().map(r =>
            r.key -> ((r.n_events, r.final_balance, r.n_capped, r.n_floored)))
          .toMap
        assert(got == expect, s"seed=$seed parts=$parts")
      }
    }
  }
}
