package graft.operators

import graft.SparkSpec

import scala.util.Random

class TiledSelfJoinSpec extends SparkSpec {

  test("every unordered id pair is compared exactly once, any block count") {
    val ids = (0L until 37L) ++ Seq(1000003L, -5L, Long.MaxValue / 7)
    val rdd = spark.sparkContext.parallelize(ids.map(id => (id, ())), 4)
    val expected = (for {
      a <- ids; b <- ids if a < b
    } yield (a, b)).toSet
    for (b <- Seq(1, 2, 3, 5, 8)) {
      val compared = TiledSelfJoin(rdd, b) { (left, right, diag) =>
        val out = Seq.newBuilder[(Long, Long)]
        var i = 0
        while (i < left.length) {
          var j = if (diag) i + 1 else 0
          while (j < right.length) {
            val (x, y) = (left(i)._1, right(j)._1)
            out += (if (x < y) (x, y) else (y, x))
            j += 1
          }
          i += 1
        }
        out.result().iterator
      }.collect()
      assert(compared.length == expected.size, s"blocks=$b: duplicate comparisons")
      assert(compared.toSet == expected, s"blocks=$b: missed pairs")
    }
  }

  test("tileIndex/tileBlocks are inverse and cover the triangle") {
    for (b <- 1 to 12) {
      val tiles = for { i <- 0 until b; j <- i until b } yield (i, j)
      assert(tiles.map { case (i, j) => TiledSelfJoin.tileIndex(i, j, b) } ==
        (0 until b * (b + 1) / 2))
      tiles.foreach { case (i, j) =>
        assert(TiledSelfJoin.tileBlocks(TiledSelfJoin.tileIndex(i, j, b), b) == (i, j))
      }
    }
  }

  test("blocksFor covers requested parallelism with the smallest triangle") {
    assert(TiledSelfJoin.blocksFor(1) == 1)
    assert(TiledSelfJoin.blocksFor(2) == 2)
    assert(TiledSelfJoin.blocksFor(32) == 8) // 8*9/2 = 36 ≥ 32, 7*8/2 = 28 < 32
    for (p <- 1 to 200) {
      val b = TiledSelfJoin.blocksFor(p)
      assert(b * (b + 1) / 2 >= p && (b == 1 || (b - 1) * b / 2 < p))
    }
  }

  test("duplicate ids never emit self-pairs (a_id < b_id strictly)") {
    import spark.implicits._
    val e = Seq(
      (1L, Array(1.0, 0.0)),
      (1L, Array(1.0, 0.0)), // duplicate id, identical vector
      (2L, Array(2.0, 0.0))).toDS()
    val cos = SimilarityJoin.cosinePairs(e, 0.5)
      .as[(Long, Long, Double)].collect()
    assert(cos.forall(p => p._1 < p._2), s"self-pair leaked: ${cos.toSeq}")
    val j = Seq((1L, Array(10L, 20L)), (1L, Array(10L, 20L)), (2L, Array(10L, 30L)))
      .toDS()
    val jac = SimilarityJoin.jaccardPairsHashed(j, 0.3)
      .as[(Long, Long, Long, Double)].collect()
    assert(jac.forall(p => p._1 < p._2), s"self-pair leaked: ${jac.toSeq}")
  }

  test("cosine results identical across block counts (incl. conf override)") {
    import spark.implicits._
    val rnd = new Random(7)
    val e = (0L until 120L).map(id => (id, Array.fill(8)(rnd.nextGaussian()))).toDS()
    val reference = SimilarityJoin.cosinePairs(e, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(reference.nonEmpty)
    for (b <- Seq("1", "3", "11")) {
      spark.conf.set(TiledSelfJoin.BlocksConfKey, b)
      try {
        val got = SimilarityJoin.cosinePairs(e, 0.5)
          .as[(Long, Long, Double)].collect().toSet
        assert(got == reference, s"blocks=$b")
      } finally spark.conf.unset(TiledSelfJoin.BlocksConfKey)
    }
  }
}
