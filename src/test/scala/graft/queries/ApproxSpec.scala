package graft.queries

import graft.SparkSpec

/** q47 has no cross-engine oracle (HLL sketches differ); assert the
  * estimates bracket the exact distinct counts within the configured
  * relative error instead.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct estimates stay within 10% of exact") {
    val got = PipelineQueries.q47(spark, sf0001)
      .select("event_type", "approx_users")
      .as[(String, Long)].collect().toMap
    val exact = graft.core.Tables.load(spark, sf0001, "events")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (et, est) =>
      val ex = exact(et).toDouble
      assert(math.abs(est - ex) / ex <= 0.10, s"$et: $est vs $ex")
    }
  }

  test("sf0.1: estimates fall within 2x the configured 2% rsd of exact") {
    val dir = "/root/testdata/sf0.1"
    val got = PipelineQueries.q47(spark, dir)
      .select("event_type", "approx_users")
      .as[(String, Long)].collect().toMap
    val exact = graft.core.Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got.keySet == exact.keySet)
    // q47 configures rsd = 0.02; HLL++ error is probabilistic, so gate at
    // 2σ — tight enough to catch a broken sketch, loose enough to never
    // flake on this fixed dataset
    got.foreach { case (et, est) =>
      val ex = exact(et).toDouble
      assert(math.abs(est - ex) / ex <= 0.04, s"$et: $est vs $ex exceeds 2x rsd")
    }
  }
}
