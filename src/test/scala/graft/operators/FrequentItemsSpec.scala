package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  private val Cap = 16

  /** Skewed stream: 5 heavy items (600–1000 occurrences) over a 500-item
    * singleton tail, deterministically shuffled. */
  private lazy val stream: Seq[String] = {
    val heavy = (0 until 5).flatMap(i => Seq.fill(1000 - i * 100)(s"h$i"))
    val tail = (0 until 500).map(i => s"t$i")
    new scala.util.Random(11).shuffle(heavy ++ tail)
  }

  private def sketchOf(parts: Int): Seq[(String, Long)] = {
    val df = stream.toDF("x").repartition(parts)
    df.agg(FrequentItems.sketch(Cap)(col("x")).as("hh"))
      .head().getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
  }

  test("sketch tolerates a nullable input column: nulls are skipped, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b")).toDF("x")
    val sk = df.agg(FrequentItems.sketch(Cap)(col("x")).as("hh"))
      .head().getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
    assert(sk == Seq(("a", 2L), ("b", 1L)), sk.toString)
  }

  test("MG guarantees hold under any partitioning: undercount ≤ N/(c+1), heavy items surface") {
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size
    val bound = n / (Cap + 1)
    for (parts <- Seq(1, 13)) {
      val sk = sketchOf(parts)
      assert(sk.size <= Cap)
      val est = sk.toMap
      // undercount only, within the mergeable-MG error bound
      for ((t, e) <- sk) {
        assert(e <= exact(t), s"overcount of $t at $parts parts")
        assert(exact(t) - e <= bound, s"$t err ${exact(t) - e} > $bound at $parts parts")
      }
      // completeness: anything truly heavier than the bound is tracked
      val mustHave = exact.filter(_._2 > bound).keySet
      assert(mustHave.subsetOf(est.keySet),
        s"missing ${mustHave -- est.keySet} at $parts parts")
      // the undisputed top item ranks first
      assert(sk.head._1 == "h0")
    }
  }

  test("finish orders counters (est DESC, item ASC) deterministically") {
    val sk = sketchOf(7)
    val resorted = sk.sortBy { case (t, e) => (-e, t) }
    assert(sk == resorted)
  }
}
