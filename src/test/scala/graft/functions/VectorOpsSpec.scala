package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(1.0, 0.0, 0.0)),
    (1L, Seq(0.0, 1.0, 0.0)),
    (2L, Seq(2.0, 0.0, 0.0)),
    (3L, Seq(1.0, 1.0, 0.0)))

  test("dot / norm / cosine basics") {
    val d = vecs.toDF("id", "v")
    val a = d.filter(col("id") === 0).select(col("v").as("a"))
    val row = d.filter(col("id") === 3).crossJoin(a)
      .select(
        VectorOps.dot(col("v"), col("a")).as("dot"),
        VectorOps.norm(col("v")).as("n"),
        VectorOps.cosine(col("v"), col("a")).as("c"))
      .head()
    assert(row.getDouble(0) == 1.0)
    assert(math.abs(row.getDouble(1) - math.sqrt(2)) < 1e-12)
    assert(math.abs(row.getDouble(2) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("knnBruteForce ranks colinear vector first, excludes probe") {
    val d = vecs.toDF("vec_id", "embedding")
    val got = VectorOps.knnBruteForce(d, "vec_id", "embedding", 0L, 3)
      .select("vec_id").as[Long].collect()
    assert(got.head == 2L)          // colinear with probe → cosine 1
    assert(!got.contains(0L))       // probe excluded
  }

  test("fused ArrayCosine is bit-equal to the composed form") {
    val rnd = new scala.util.Random(13)
    val data = (0 until 60).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val d = data.toDF("id", "v")
    val b = d.select(col("v").as("w")).limit(1)
    val both = d.crossJoin(b)
      .select(VectorOps.cosine(col("v"), col("w")).as("fused"),
              VectorOps.cosineComposed(col("v"), col("w")).as("ref"))
      .collect()
    assert(both.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("fused ArrayCosine matches composed form on ragged and null-element arrays") {
    // both norms nonzero: on a zero norm the composed form throws
    // DIVIDE_BY_ZERO under ANSI while the fused form yields NaN (see
    // ArrayCosine scaladoc) — callers guarantee nonzero vectors
    val d = Seq(
      (Seq[java.lang.Double](3.0, 4.0, 5.0), Seq[java.lang.Double](1.0, 2.0)),
      (Seq[java.lang.Double](1.0, null, 2.0), Seq[java.lang.Double](2.0, 5.0, 1.0)))
      .toDF("a", "b")
    val rows = d.select(
        VectorOps.cosine(col("a"), col("b")).as("fused"),
        VectorOps.cosineComposed(col("a"), col("b")).as("ref"))
      .collect()
    rows.foreach { r =>
      val (f, ref) = (r.getDouble(0), r.getDouble(1))
      assert(f == ref || (f.isNaN && ref.isNaN), s"$f vs $ref")
    }
  }

  test("native ArrayDot agrees exactly with the HOF formulation") {
    val rnd = new scala.util.Random(7)
    val data = (0 until 50).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val d = data.toDF("id", "v")
    val b = d.select(col("v").as("w")).limit(1)
    val both = d.crossJoin(b)
      .select(VectorOps.dot(col("v"), col("w")).as("fast"),
              VectorOps.dotHof(col("v"), col("w")).as("ref"))
      .collect()
    assert(both.forall(r => r.getDouble(0) == r.getDouble(1))) // bit-equal
  }

  test("native ArraySqDistLong agrees exactly with the HOF formulation") {
    val rnd = new scala.util.Random(11)
    val data = (0 until 50).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextInt(4000001).toLong - 2000000L)))
    val d = data.toDF("id", "v")
    val b = d.select(col("v").as("w")).limit(1)
    val both = d.crossJoin(b)
      .select(VectorOps.sqDistLong(col("v"), col("w")).as("fast"),
              VectorOps.sqDistLongHof(col("v"), col("w")).as("ref"))
      .collect()
    assert(both.forall(r => r.getLong(0) == r.getLong(1)))
    // degenerate cases (native only — the HOF null-pads unequal
    // lengths): common-prefix semantics, and empty arrays give 0
    val e = Seq((Seq(1L, 2L, 3L), Seq(1L, 5L)), (Seq.empty[Long], Seq.empty[Long]))
      .toDF("a", "b")
      .select(VectorOps.sqDistLong(col("a"), col("b")).as("s"))
      .collect()
    assert(e(0).getLong(0) == 9L && e(1).getLong(0) == 0L)
  }

  test("signBucket groups same-orthant vectors") {
    val d = Seq(
      (0L, Seq(1.0, 1.0, -1.0, 1.0)),
      (1L, Seq(2.0, 0.5, -3.0, 0.1)), // same signs as 0
      (2L, Seq(-1.0, 1.0, 1.0, -1.0))).toDF("id", "v")
    val b = d.select(col("id"), VectorOps.signBucket(col("v"), 4).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(b(0L) == b(1L))
    assert(b(0L) != b(2L))
    assert(b.values.forall(v => v >= 0 && v < 16))
  }

  /** Deterministic vectors spanning many orthants. */
  private def fixture12d(n: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(47)
    (0L until n.toLong).map { i =>
      (i, Seq.fill(12)(rnd.nextGaussian()))
    }.toDF("vec_id", "embedding")
  }

  test("more hyperplane bits: near-dup pairs are a subset of fewer bits (recall model)") {
    // agreement on sign bits [0, 8) implies agreement on [0, 4), so the
    // 8-bit candidate (and pair) set can only shrink — the documented
    // bits <-> parallelism <-> recall trade
    val e = fixture12d(300)
    def pairs(bits: Int) =
      VectorOps.cosineNearDupLsh(e, "vec_id", "embedding", bits, 0.2)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val at4 = pairs(4); val at8 = pairs(8)
    assert(at4.nonEmpty)
    assert(at8.subsetOf(at4))
    assert(at8.size < at4.size, "8 bits should prune some same-4-bit pairs here")
  }

  test("annSearchLsh at 8 bits returns a subset of the probe bucket's 4-bit candidates") {
    val e = fixture12d(300)
    def hits(bits: Int) =
      VectorOps.annSearchLsh(e, "vec_id", "embedding", probeId = 0L,
          k = 300, nBits = bits) // k = corpus: the full candidate set
        .select("vec_id").as[Long].collect().toSet
    val at4 = hits(4); val at8 = hits(8)
    assert(at4.nonEmpty && at8.subsetOf(at4))
  }

  test("cosineNearDupLsh emits strict a_id < b_id with exact verified sims") {
    val e = fixture12d(120)
    val got = VectorOps.cosineNearDupLsh(e, "vec_id", "embedding", 4, 0.2)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (a, b, s) => a < b && s >= 0.2 && s <= 1.0 })
    // verified against brute-force cosine on the collected vectors
    val vecs = e.as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val r = d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      math.rint(r * 10000) / 10000
    }
    got.foreach { case (a, b, s) => assert(math.abs(cos(vecs(a), vecs(b)) - s) < 1e-9) }
  }
}
