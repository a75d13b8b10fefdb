package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: Morton-code correctness against a bit-by-bit
  * reference, the quadrant-locality property, and the data-skipping
  * payoff — a 2-D box predicate must intersect FEWER files' min/max
  * ranges under z-layout than under a single-column sort.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zvalue matches the bit-by-bit Morton reference") {
    val rnd = new scala.util.Random(11)
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (Int.MaxValue.toLong, 0L),
      (0L, Int.MaxValue.toLong), (Int.MaxValue.toLong, Int.MaxValue.toLong)) ++
      (0 until 200).map(_ =>
        (rnd.nextInt(Int.MaxValue).toLong, rnd.nextInt(Int.MaxValue).toLong))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zvalue(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == mortonRef(a, b), s"($a, $b)") }
  }

  test("out-of-domain keys are masked to their low 32 bits, not sign-garbled") {
    // hash-mod bucketing (the documented suggestion) can go negative;
    // sign extension must not leak into the interleave
    val got = Seq((-1L, 5L), (-7L, -9L), (1L << 40, 3L)).toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zvalue(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == mortonRef(a & 0xFFFFFFFFL, b & 0xFFFFFFFFL), s"($a, $b)")
    }
  }

  test("quadrant locality: points in one 2^k cell share the z prefix") {
    val rnd = new scala.util.Random(12)
    (0 until 100).foreach { _ =>
      val k = 4 + rnd.nextInt(8)
      val cellA = rnd.nextInt(1 << 10).toLong
      val cellB = rnd.nextInt(1 << 10).toLong
      val (a1, b1) = (cellA << k | rnd.nextInt(1 << k), cellB << k | rnd.nextInt(1 << k))
      val (a2, b2) = (cellA << k | rnd.nextInt(1 << k), cellB << k | rnd.nextInt(1 << k))
      assert(mortonRef(a1, b1) >> (2 * k) == mortonRef(a2, b2) >> (2 * k))
    }
  }

  test("z-layout prunes a 2-D box against file stats where linear sort cannot") {
    // 64k points on a 256x256 grid, written as 16 files under each
    // layout; per-file (min, max) of both keys stand in for parquet
    // footer stats (what a stats-aware reader or table format prunes on)
    val n = 256
    val pts = (0 until n * n).map(i => (i / n, i % n)).toDF("x", "y")
    def fileBoxes(df: org.apache.spark.sql.DataFrame): Seq[(Int, Int, Int, Int)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft_z").toString
      df.write.mode("overwrite").parquet(dir)
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .toSeq.map { f =>
          spark.read.parquet(f.getAbsolutePath)
            .agg(min("x"), max("x"), min("y"), max("y"))
            .as[(Int, Int, Int, Int)].head()
        }
    }
    val zBoxes = fileBoxes(ZOrder.layout(pts, col("x"), col("y"), 16))
    val linBoxes = fileBoxes(
      pts.repartitionByRange(16, col("x"), col("y"))
        .sortWithinPartitions(col("x"), col("y")))
    assert(zBoxes.size >= 8 && linBoxes.size >= 8)
    // an 11-wide band predicate on ONE dimension at a time: the linear
    // (x-then-y) sort serves x-bands perfectly but every file spans all
    // of y, so a y-band hits everything; z-layout bounds BOTH, so its
    // worst dimension beats linear's worst dimension — that bounded
    // worst case is the z-order claim
    def hitsX(boxes: Seq[(Int, Int, Int, Int)]): Int =
      boxes.count { case (x0, x1, _, _) => x1 >= 60 && x0 <= 70 }
    def hitsY(boxes: Seq[(Int, Int, Int, Int)]): Int =
      boxes.count { case (_, _, y0, y1) => y1 >= 60 && y0 <= 70 }
    val zWorst = math.max(hitsX(zBoxes), hitsY(zBoxes))
    val linWorst = math.max(hitsX(linBoxes), hitsY(linBoxes))
    assert(zWorst < linWorst,
      s"z worst $zWorst/${zBoxes.size} vs linear worst $linWorst/${linBoxes.size}")
  }
}
