package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantizer: training shape, scan-local encode, ADC search. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val M = 8
  private val K = 4
  private val Dim = 64

  /** 6 well-separated clusters × 15 vectors, 64-dim: cluster centers are
    * axis-ish random unit directions, members add small noise. */
  private lazy val clustered: Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(6)(Seq.fill(Dim)(rnd.nextDouble() * 2 - 1))
    for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 15
    } yield ((ci * 15 + j).toLong, c.map(_ + (rnd.nextDouble() - 0.5) * 0.02))
  }

  private def df = clustered.toDF("vec_id", "embedding")

  test("train: m×k codebooks of dsub dims; deterministic under input partitioning") {
    val m1 = Pq.train(df, "vec_id", "embedding", M, K, sampleN = 64, iters = 2)
    assert(m1.dsub == Dim / M)
    assert(m1.centsArr.length == M)
    assert(m1.centsArr.forall(_.length == K))
    assert(m1.centsArr.forall(_.forall(_.length == Dim / M)))
    // hash-sampled training is data-order-independent
    val m2 = Pq.train(df.repartition(7), "vec_id", "embedding", M, K,
      sampleN = 64, iters = 2)
    assert(m1.centsArr.map(_.map(_.toSeq).toSeq).toSeq ==
      m2.centsArr.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("encode: codes in [0,k), match the local argmin, and shuffle nothing") {
    val model = Pq.train(df, "vec_id", "embedding", M, K, sampleN = 64, iters = 2)
    val coded = Pq.encode(df, "vec_id", "embedding", model)
    val got = coded.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got.size == clustered.size)
    assert(got.values.forall(cs => cs.length == M && cs.forall(c => c >= 0 && c < K)))
    // local reference argmin, same d2 op order (sequential dots)
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    for ((id, v) <- clustered) {
      val expect = (0 until M).map { j =>
        val sv = v.slice(j * model.dsub, (j + 1) * model.dsub)
        val ds = (0 until K).map { c =>
          val ct = model.centsArr(j)(c).toSeq
          dot(sv, sv) - 2.0 * dot(sv, ct) + dot(ct, ct)
        }
        ds.indexOf(ds.min).toLong
      }
      assert(got(id) == expect, s"codes mismatch for vec $id")
    }
    // scan-local: centroid literals, no join, no exchange anywhere
    val plan = coded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode plan shuffles:\n$plan")
  }

  test("adcSearch with full-corpus shortlist equals brute-force exact knn") {
    val model = Pq.train(df, "vec_id", "embedding", M, K, sampleN = 64, iters = 2)
    val adc = Pq.adcSearch(df, "vec_id", "embedding", model,
        probeId = 0L, shortlist = clustered.size, topK = 5)
      .select("vec_id", "sim").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = VectorOps.knnBruteForce(df, "vec_id", "embedding", 0L, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(adc.toSeq == exact.toSeq)
  }

  test("adcSearch with tight shortlist stays in the probe's cluster; no global sort") {
    val model = Pq.train(df, "vec_id", "embedding", M, K, sampleN = 64, iters = 2)
    val res = Pq.adcSearch(df, "vec_id", "embedding", model,
      probeId = 0L, shortlist = 10, topK = 5)
    val ids = res.select("vec_id").as[Long].collect()
    assert(ids.length == 5)
    assert(!ids.contains(0L))
    assert(ids.forall(_ < 15L), s"neighbors left cluster 0: ${ids.mkString(",")}")
    // the shortlist is a TakeOrderedAndProject over the codes scan — no
    // global Sort materializes
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("ivfPqSearch: cell pruning + ADC shortlist + exact rerank stay in-cluster") {
    val model = Pq.train(df, "vec_id", "embedding", M, K, sampleN = 64, iters = 2)
    val ivf = VectorOps.ivfModel(df, "vec_id", "embedding", nCells = 6,
      sampleN = 64, iters = 2)
    val res = Pq.ivfPqSearch(ivf.assigned, "vec_id", model,
      probeId = 0L, shortlist = 14, topK = 5)
    val ids = res.select("vec_id").as[Long].collect()
    assert(ids.length == 5)
    assert(!ids.contains(0L))
    // a tight cluster lands in one IVF cell; inter-cluster ADC distances
    // dwarf intra-cluster ones, so the shortlist and rerank stay home
    assert(ids.forall(_ < 15L), s"neighbors left cluster 0: ${ids.mkString(",")}")
  }

  test("missing probe id fails fast") {
    val model = Pq.train(df, "vec_id", "embedding", M, K, sampleN = 64, iters = 2)
    intercept[IllegalArgumentException] {
      Pq.adcSearch(df, "vec_id", "embedding", model,
        probeId = 999L, shortlist = 10, topK = 5)
    }
  }
}
