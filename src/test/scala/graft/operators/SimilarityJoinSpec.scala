package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  test("cosinePairs finds colinear pair, respects threshold and a<b") {
    val e = Seq(
      (1L, Array(1.0, 0.0)),
      (2L, Array(2.0, 0.0)),  // colinear with 1 → sim 1.0
      (3L, Array(0.0, 1.0)))  // orthogonal to both
      .toDS()
    val got = SimilarityJoin.cosinePairs(e, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 1.0)))
  }

  test("string and hashed jaccard formulations agree") {
    val rnd = new Random(3)
    val vocab = (0 until 30).map(i => s"w$i")
    val docs = (0L until 40L).map { id =>
      (id, Seq.fill(rnd.nextInt(20) + 5)(vocab(rnd.nextInt(vocab.size))))
    }
    val strDs = docs.toDS()
    val hashedDs = strDs.toDF("id", "toks")
      .select(col("id"),
        array_sort(array_distinct(transform(col("toks"), t => xxhash64(t)))).as("h"))
      .as[(Long, Array[Long])]
    val a = SimilarityJoin.jaccardPairs(strDs, 0.3)
      .select("a_id", "b_id", "common", "jac")
      .as[(Long, Long, Long, Double)].collect().toSet
    val b = SimilarityJoin.jaccardPairsHashed(hashedDs, 0.3)
      .select("a_id", "b_id", "common", "jac")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(a == b)
    assert(a.forall(_._4 >= 0.3))
  }

  test("jaccardTile emits lazily — partial consumption never touches later rows") {
    // Poisoned (null-set) row at the tail: the old Seq.newBuilder kernel
    // computed EVERY pair before returning, so construction+first-pull
    // would NPE. The lazy cursor form only reaches the poison when the
    // consumer pulls far enough. Row-major order on a diag tile means
    // i=0 sweeps j=1..10, so pairs 1..9 precede the first poisoned pair.
    val h = Array(1L, 2L, 3L)
    val rows = Array.tabulate(10)(i => (i.toLong, h)) :+ ((99L, null: Array[Long]))
    val it = SimilarityJoin.jaccardTile(0.0)(rows, rows, diag = true)
    assert(it.take(9).length == 9) // safe prefix — poison untouched
    val it2 = SimilarityJoin.jaccardTile(0.0)(rows, rows, diag = true)
    intercept[NullPointerException] { it2.foreach(_ => ()) } // full drain reaches it
  }

  test("dense corpus at threshold 0 streams all O(n²) pairs correctly") {
    // every vector identical → every pair passes; the kernels must emit
    // the full n(n-1)/2 set (cursor bookkeeping must not skip or repeat)
    val n = 60
    val e = (0L until n.toLong).map(id => (id, Array(1.0, 2.0, 3.0))).toDS()
    val cos = SimilarityJoin.cosinePairs(e, 0.0).collect()
    assert(cos.length == n * (n - 1) / 2)
    assert(cos.forall(_.getDouble(2) == 1.0))
    val d = (0L until n.toLong).map(id => (id, Seq("a", "b", "c"))).toDS()
    val jac = SimilarityJoin.jaccardPairs(d, 0.0).collect()
    assert(jac.length == n * (n - 1) / 2)
    assert(jac.forall(_.getDouble(3) == 1.0))
  }

  test("pair exactly at the threshold is kept (early abort must not drop it)") {
    // |A|=2, |B|=2, common=1 → jac = 1/3; threshold 1/3 rounded
    val d = Seq(
      (1L, Seq("a", "b")),
      (2L, Seq("b", "c"))).toDS()
    val got = SimilarityJoin.jaccardPairs(d, 0.3333)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 2L, 1L, 0.3333)))
  }

  test("sqDistPairsPruned equals the exact tiled kernel on real embeddings") {
    import org.apache.spark.sql.functions._
    val qv = graft.core.Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => round(x * 1000).cast("long")).as("v"))
      .as[(Long, Array[Long])]
    for (eps2 <- Seq(1300000L, 300000L, 5000000L)) {
      val exact = SimilarityJoin.sqDistPairs(qv, eps2)
        .as[(Long, Long, Long)].collect().sorted.toSeq
      val pruned = SimilarityJoin.sqDistPairsPruned(qv, eps2)
        .as[(Long, Long, Long)].collect().sorted.toSeq
      graft.core.Pins.release()
      assert(pruned == exact, s"eps2=$eps2: ${pruned.size} vs ${exact.size} pairs")
      assert(exact.nonEmpty || eps2 < 300001L) // the fixture must exercise the join
    }
  }

  test("sqDistPairsPruned completeness holds when nAnchors exceeds the corpus") {
    val tiny = Seq(
      (1L, Array(0L, 0L)), (2L, Array(3L, 4L)), (3L, Array(100L, 100L)),
      (4L, Array(2L, 2L))).toDS()
    val got = SimilarityJoin.sqDistPairsPruned(tiny, 25L, nAnchors = 32)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    graft.core.Pins.release()
    // exact pairs at d2<=25: (1,2)=25, (1,4)=8, (2,4)=5
    assert(got == Seq((1L, 2L, 25L), (1L, 4L, 8L), (2L, 4L, 5L)))
  }
}
