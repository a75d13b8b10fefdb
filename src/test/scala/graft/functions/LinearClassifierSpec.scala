package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class LinearClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Independent in-memory batch perceptron (plain Scala, no Spark) —
    * the same role BpeSpec's reference implementation plays for q72. */
  private def referenceTrain(rows: Seq[(Array[Long], Long)], dim: Int,
                             rounds: Int): (Array[Long], Long) = {
    val w = Array.fill(dim)(0L)
    var b = 0L
    (1 to rounds).foreach { _ =>
      val mis = rows.filter { case (x, y) =>
        y * (x.indices.map(j => w(j) * x(j)).sum + b) <= 0
      }
      val dw = Array.tabulate(dim)(j => mis.map { case (x, y) => y * x(j) }.sum)
      (0 until dim).foreach(j => w(j) += dw(j))
      b += mis.map(_._2).sum
    }
    (w, b)
  }

  private def fixture(n: Int, dim: Int, seed: Int) = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      // separable-with-noise: y decided by a hidden direction + flip noise
      val x = Array.fill(dim)(rnd.nextInt(2001) - 1000L)
      val hidden = x.take(dim / 2).sum - x.drop(dim / 2).sum
      val y = if (hidden > 0 ^ rnd.nextInt(10) == 0) 1L else -1L
      (i.toLong, x.toSeq, y)
    }
  }

  test("dataflow training equals the in-memory reference, any partitioning") {
    val dim = 8
    val rows = fixture(200, dim, seed = 85)
    val (refW, refB) = referenceTrain(rows.map(r => (r._2.toArray, r._3)), dim, 3)
    Seq(1, 4, 7).foreach { parts =>
      val df = spark.createDataset(rows).toDF("vec_id", "x", "y")
        .repartition(parts)
      val m = LinearClassifier.train(df, "x", "y", dim, rounds = 3)
      assert(m.w.toSeq === refW.toSeq, s"weights diverge at $parts partitions")
      assert(m.b === refB, s"bias diverges at $parts partitions")
    }
  }

  test("quantize is floor, not round: -0.0015 * 1000 -> -2") {
    val df = Seq((1L, Seq(-0.0015f, 0.0015f, 1.0f, -1.0f)))
      .toDF("id", "v")
      .select(LinearClassifier.quantize(col("v"), 1000).as("x"))
    assert(df.as[Seq[Long]].head() === Seq(-2L, 1L, 1000L, -1000L))
  }

  test("rawScore matches the reference dot product under the trained model") {
    val dim = 8
    val rows = fixture(80, dim, seed = 7)
    val df = spark.createDataset(rows).toDF("vec_id", "x", "y")
    val m = LinearClassifier.train(df, "x", "y", dim, rounds = 2)
    val got = df.select(col("vec_id"),
        LinearClassifier.rawScore(col("x"), m).as("s"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, x, _) =>
      val expect = x.indices.map(j => m.w(j) * x(j)).sum + m.b
      assert(got(id) === expect)
    }
  }

  test("a linearly separable fixture is fully separated after enough rounds") {
    val dim = 4
    val rnd = new Random(3)
    // y = sign of first coordinate, margin >= 1 guaranteed
    val rows = (0 until 100).map { i =>
      val lead = (rnd.nextInt(1000) + 1L) * (if (i % 2 == 0) 1 else -1)
      val x = Array(lead) ++ Array.fill(dim - 1)(rnd.nextInt(21) - 10L)
      (i.toLong, x.toSeq, if (lead > 0) 1L else -1L)
    }
    val df = spark.createDataset(rows).toDF("vec_id", "x", "y")
    val m = LinearClassifier.train(df, "x", "y", dim, rounds = 12)
    val misclassified = df.filter(
      col("y") * LinearClassifier.rawScore(col("x"), m) <= 0).count()
    assert(misclassified === 0L)
  }
}
