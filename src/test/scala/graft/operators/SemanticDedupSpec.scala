package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def stats(rows: Seq[CellVec], parts: Int = 3,
                    num: Long = 49L, den: Long = 400L,
                    maxTaskMembers: Int = 4096)
      : Map[Long, CellDedup] =
    SemanticDedup.withinCellStats(
        spark.createDataset(rows).toDF().repartition(parts), num, den,
        maxTaskMembers)
      .as[CellDedup].collect().map(r => r.cell -> r).toMap

  test("crafted geometry: exact dup, orthogonal, 45-degree, keep-first") {
    val rows = Seq(
      CellVec(0L, 1L, Array(1000L, 0L)),
      CellVec(0L, 2L, Array(1000L, 0L)),   // exact dup of 1
      CellVec(0L, 3L, Array(0L, 1000L)),   // orthogonal to 1/2
      CellVec(0L, 4L, Array(707L, 707L)),  // cos ~0.707 with everything
      CellVec(1L, 9L, Array(5L, 5L)))      // singleton cell
    val got = stats(rows)
    // pairs at tau = 0.35: (1,2), (1,4), (2,4), (3,4); removed = {2, 4}
    assert(got(0L) == CellDedup(0L, 4L, 4L, 2L, 2L))
    assert(got(1L) == CellDedup(1L, 1L, 0L, 0L, 1L))
    // negative dot never dups even though cos^2 clears the threshold
    val anti = Seq(CellVec(0L, 1L, Array(1000L, 0L)),
      CellVec(0L, 2L, Array(-1000L, 0L)))
    assert(stats(anti)(0L) == CellDedup(0L, 2L, 0L, 0L, 2L))
  }

  test("bit-identical under 1/3/32 partitions and equal to a brute-force replay on real data") {
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select((col("vec_id") % 4).as("cell"), col("vec_id"),
        expr("transform(CAST(embedding AS ARRAY<DOUBLE>)," +
          " x -> CAST(round(x * 1000) AS BIGINT))").as("q"))
      .as[CellVec].collect().toSeq
    val expected = vecs.groupBy(_.cell).map { case (c, vs) =>
      val s = vs.sortBy(_.vec_id)
      def dot(a: Array[Long], b: Array[Long]) =
        a.zip(b).map { case (x, y) => x * y }.sum
      var pairs = 0L
      val rem = scala.collection.mutable.Set[Long]()
      for (i <- s.indices; j <- (i + 1) until s.length) {
        val dt = dot(s(i).q, s(j).q)
        if (dt > 0 && dt * dt * 400L >= 49L * dot(s(i).q, s(i).q) *
            dot(s(j).q, s(j).q)) {
          pairs += 1; rem += s(j).vec_id
        }
      }
      c -> CellDedup(c, s.length.toLong, pairs, rem.size.toLong,
        s.length - rem.size.toLong)
    }
    for (p <- Seq(1, 3, 32)) {
      val got = stats(vecs.toSeq, parts = p)
      assert(got.keySet == expected.keySet)
      expected.foreach { case (c, e) => assert(got(c) == e, s"cell $c at $p") }
    }
  }

  test("degenerate hot cell: sub-sharded stats bit-identical to the single-task fold") {
    // a template flood: 400 members in ONE cell drawn from 35 distinct
    // vectors (lots of exact dups + near-dups on both sides of any
    // shard boundary), plus a second small cell as a bystander
    val rows = (1 to 400).map { i =>
      val q =
        if (i % 4 == 0) Array(1000L, 0L, 0L)
        else Array(0L, 900L + (i % 7).toLong, 11L * (i % 5).toLong)
      CellVec(0L, i.toLong, q)
    } :+ CellVec(7L, 1000L, Array(3L, 4L, 0L)) :+
      CellVec(7L, 1001L, Array(3L, 4L, 1L))
    val single = stats(rows, parts = 5) // maxTaskMembers default: 1 task/cell
    // 13 shards (400/32) → 91 pair groups; 3 shards; and a 2-shard split
    for (mtm <- Seq(32, 150, 200)) {
      val sharded = stats(rows, parts = 5, maxTaskMembers = mtm)
      assert(sharded == single, s"maxTaskMembers=$mtm")
    }
    // sanity: the flood cell really is dup-heavy (sub-sharding had work)
    assert(single(0L).n_dup_pairs > 1000L)
    assert(single(0L).n_removed > 300L)
  }

  test("ragged vectors are rejected, not truncated") {
    val rows = Seq(CellVec(0L, 1L, Array(1000L, 0L)),
      CellVec(0L, 2L, Array(1000L)))
    val ex = intercept[Exception] { stats(rows) }
    assert(ex.getMessage != null)
  }
}
