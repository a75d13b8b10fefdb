package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality gate for the IVF coarse quantizer: on a clustered fixture
  * engineered so the naive first-N-ids quantizer collapses (ids 0..7 all
  * live in ONE cluster), the k-means quantizer must recover strictly
  * better recall@k against brute force and better cell balance.
  */
class IvfQuantizerSpec extends SparkSpec {
  import spark.implicits._

  // 8 angular clusters in 8-D: cluster c points around 6·e_c with small
  // deterministic noise. Ids 0..23 are cluster 0 — so first-8-ids seeds
  // all fall into the same cluster.
  private def fixture: DataFrame = {
    val rows = for {
      c <- 0 until 8
      j <- 0 until 24
    } yield {
      val id = (c * 24 + j).toLong
      val v = Array.tabulate(8) { k =>
        val noise = (((id * 31 + k * 7) % 11) - 5) * 0.05
        (if (k == c) 6.0 else 0.0) + noise
      }
      (id, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private val k = 5
  // one probe per cluster: a mid-cluster member each
  private val probes: Seq[Long] = (0 until 8).map(c => (c * 24 + 12).toLong)

  private def meanRecall(assigned: DataFrame): Double = {
    val e = fixture
    val rs = probes.map { probeId =>
      val truth = VectorOps.knnBruteForce(e, "vec_id", "embedding", probeId, k)
        .select("vec_id").as[Long].collect().toSet
      val got = VectorOps.ivfSearch(e, "vec_id", "embedding", 8, probeId, k,
        assignedOverride = Some(assigned))
        .select("vec_id").as[Long].collect().toSet
      truth.intersect(got).size.toDouble / k
    }
    rs.sum / rs.size
  }

  private def maxCell(assigned: DataFrame): Long =
    assigned.groupBy("cell").count().agg(max("count")).head().getLong(0)

  test("k-means quantizer beats first-ids on recall and cell balance") {
    val naive = VectorOps.ivfAssignByFirstIds(fixture, "vec_id", "embedding", 8)
    val kmeans = VectorOps.ivfAssign(fixture, "vec_id", "embedding", 8,
      sampleN = 192, iters = 2)
    val (rNaive, rKmeans) = (meanRecall(naive), meanRecall(kmeans))
    info(s"mean recall@5 naive=$rNaive kmeans=$rKmeans; " +
      s"maxCell naive=${maxCell(naive)} kmeans=${maxCell(kmeans)}")
    assert(rKmeans > rNaive, "k-means recall must strictly beat first-ids here")
    assert(rKmeans >= 0.95, "well-separated clusters: near-perfect recall expected")
    assert(maxCell(kmeans) < maxCell(naive),
      "k-means cells must be better balanced than id-order cells")
  }

  test("quantizer is invariant to input row order") {
    val shuffled = fixture.orderBy(md5(concat(col("vec_id").cast("string"), lit("salt"))))
    val a = VectorOps.ivfAssign(fixture, "vec_id", "embedding", 8, 192, 2)
      .select(col("vec_id"), col("cell")).as[(Long, Long)].collect().toMap
    val b = VectorOps.ivfAssign(shuffled, "vec_id", "embedding", 8, 192, 2)
      .select(col("vec_id"), col("cell")).as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("empty-cell fallback keeps the seed centroid (no null centroids)") {
    // 2 tight clusters but 4 cells: some cells end up empty after Lloyd;
    // centroid count must stay 4 and assignment must still be total
    val rows = (0 until 16).map { i =>
      (i.toLong, Seq.tabulate(4)(k => (if (i % 2 == k % 2) 5.0 else 0.0) + i * 0.001))
    }
    val model = VectorOps.ivfModel(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", 4, sampleN = 16, iters = 2)
    assert(model.centroids.count() == 4)
    assert(model.assigned.count() == 16)
    assert(model.centroids.filter(col("__c").isNull).count() == 0)
  }
}
