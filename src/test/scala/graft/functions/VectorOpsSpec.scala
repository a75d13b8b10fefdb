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
}
