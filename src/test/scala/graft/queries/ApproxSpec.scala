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
}
