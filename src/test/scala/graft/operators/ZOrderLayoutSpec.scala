package graft.operators

import graft.SparkSpec

/** q268's fixture assertion — the audit's HEADLINE must hold on real
  * data, not just on crafted points (core.ZOrderSpec proves the Morton
  * code and the layout's box geometry; this proves the decision the
  * audit exists to make comes out the right way on the lineitem
  * fixture): a 2-D probe hits strictly fewer z-order cells than
  * single-column-sorted cells, and the 1-D penalty stays bounded. */
class ZOrderLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("q268 fixture: z-order prunes the 2-D probe better than linear, 1-D comparable") {
    val df = graft.queries.PipelineQueries
      .q268(spark, "/root/testdata/sf0.001")
      .select("layout", "hit_x", "hit_xy")
      .as[(String, Int, Int)].collect()
    val zXY = df.filter(_._1 == "zorder").map(_._3).sum
    val lXY = df.filter(_._1 == "linear").map(_._3).sum
    val zX = df.filter(_._1 == "zorder").map(_._2).sum
    val lX = df.filter(_._1 == "linear").map(_._2).sum
    assert(zXY < lXY, s"zorder hit_xy $zXY !< linear $lXY")
    assert(zX <= 4 * math.max(lX, 1), s"zorder hit_x $zX vs linear $lX")
  }
}
