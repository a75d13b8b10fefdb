package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SequenceRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def lastK(rows: Seq[(Long, Long, Long, String)], k: Int,
                    parts: Int): Map[Long, Seq[(Long, Long, String)]] =
    spark.createDataset(rows).toDF("key", "us", "id", "payload")
      .repartition(parts)
      .groupBy(col("key"))
      .agg(SequenceRetention.lastK(k)(col("us"), col("id"), col("payload"))
        .as("kept"))
      .as[(Long, Seq[(Long, Long, String)])]
      .collect().toMap

  test("crafted geometry: recency order, id tie-break, chronological output") {
    val rows = Seq[(Long, Long, Long, String)](
      (1L, 10L, 1L, "a"), (1L, 30L, 2L, "b"), (1L, 20L, 3L, "c"),
      (1L, 30L, 4L, "d"), // same us as id=2: newer by id
      (2L, 5L, 5L, "x"))
    val got = lastK(rows, k = 3, parts = 2)
    // key 1 recency: (30,4,d) > (30,2,b) > (20,3,c) > (10,1,a); last-3
    // reversed to chronological = (20,3,c), (30,2,b), (30,4,d)
    assert(got(1L) == Seq((20L, 3L, "c"), (30L, 2L, "b"), (30L, 4L, "d")))
    // a short history keeps everything
    assert(got(2L) == Seq((5L, 5L, "x")))
  }

  test("buffer never exceeds k and reduce rejects stale rows once warm") {
    val agg = new LastKAgg(4)
    var buf = agg.zero
    // ascending stream: every row displaces the oldest
    for (i <- 1L to 1000L) {
      buf = agg.reduce(buf, (i, i, s"p$i"))
      assert(buf.length <= 4)
    }
    assert(agg.finish(buf).map(_._1) == Seq(997L, 998L, 999L, 1000L))
    // a row older than the kept tail leaves the buffer untouched (the
    // O(1) reject path)
    assert(agg.reduce(buf, (1L, 0L, "old")) eq buf)
  }

  test("bit-identical under 1/3/32 partitions and equal to a window replay on real data") {
    val ev = graft.core.Tables.load(spark, sf0001, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
    val rows = ev.as[(Long, Long, Long, String)].collect().toSeq
    // the unbounded formulation this operator replaces: row_number
    // over the identical (us DESC, id DESC) order, rn <= k, reversed
    val expected = rows.groupBy(_._1).map { case (u, es) =>
      u -> es.sortBy(e => (-e._2, -e._3)).take(8)
        .map(e => (e._2, e._3, e._4)).reverse
    }
    for (p <- Seq(1, 3, 32)) {
      val got = lastK(rows, k = 8, parts = p)
      assert(got.keySet == expected.keySet)
      expected.foreach { case (u, tail) =>
        assert(got(u) == tail, s"user $u at $p partitions")
      }
    }
  }
}
