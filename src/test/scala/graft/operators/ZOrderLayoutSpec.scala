package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class ZOrderLayoutSpec extends SparkSpec {
  import spark.implicits._

  /** reference interleave: plain bit loop, the definition the magic
    * numbers are supposed to equal */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zkey2 equals the bit-loop Morton interleave on random 16-bit pairs") {
    val rnd = new Random(7)
    val pts = Seq.fill(300)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrderLayout.zkey2(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == mortonRef(x, y), s"($x,$y)") }
  }

  test("zkey2 is monotone along each axis when the other is fixed") {
    // spread16 preserves order (bits keep relative positions), and the
    // OR combines disjoint bit sets — so fixing one axis, the key is
    // strictly increasing in the other: prefix cells are rectangles.
    val xs = (0L until 200L)
    val ks = xs.map(x => mortonRef(x, 37L))
    assert(ks == ks.sorted && ks.distinct.size == ks.size)
    val ks2 = xs.map(y => mortonRef(37L, y))
    assert(ks2 == ks2.sorted && ks2.distinct.size == ks2.size)
  }

  test("layout: exactly-once coverage and disjoint per-file z-ranges") {
    val rnd = new Random(11)
    val df = Seq.fill(2000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
      .zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "y")
    val out = ZOrderLayout.layout(df, col("x"), col("y"), 8)
    // every input row appears exactly once
    assert(out.count() == 2000)
    assert(out.select("id").distinct().count() == 2000)
    // per-partition [min,max] z-ranges are pairwise disjoint (the
    // repartitionByRange contract — the property file-skipping needs)
    val ranges = out
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("_zkey").as("lo"), max("_zkey").as("hi"))
      .as[(Int, Long, Long)].collect().sortBy(_._2)
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._2, s"$a overlaps $b")
      case _           => ()
    }
  }

  test("q268 fixture: z-order prunes the 2-D probe better than linear, 1-D comparable") {
    val df = graft.queries.PipelineQueries
      .q268(spark, "/root/testdata/sf0.001")
      .select("layout", "hit_x", "hit_xy")
      .as[(String, Int, Int)].collect()
    val zXY = df.filter(_._1 == "zorder").map(_._3).sum
    val lXY = df.filter(_._1 == "linear").map(_._3).sum
    val zX = df.filter(_._1 == "zorder").map(_._2).sum
    val lX = df.filter(_._1 == "linear").map(_._2).sum
    // the audit's headline: 2-D probes hit strictly fewer z-order cells
    assert(zXY < lXY, s"zorder hit_xy $zXY !< linear $lXY")
    // and the 1-D penalty is bounded (z-order still prunes on x via the
    // interleaved prefix; linear is optimal on x by construction)
    assert(zX <= 4 * math.max(lX, 1), s"zorder hit_x $zX vs linear $lX")
  }
}
