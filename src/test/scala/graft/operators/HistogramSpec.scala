package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistogramSpec extends SparkSpec {
  import spark.implicits._

  test("per-group map equals the groupBy grid exactly on real data") {
    val cents = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val viaAgg = cents.groupBy(col("event_type"))
      .agg(Histogram.longHistogram(col("cents")).as("hist"))
      .select(col("event_type"), explode(col("hist")).as(Seq("cents", "cnt")))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaGrid = cents.groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaAgg == viaGrid)
  }

  test("merge is commutative and associative; reduce increments one key") {
    val agg = new LongHistogramAgg
    val a = Map(1L -> 2L, 5L -> 1L)
    val b = Map(1L -> 1L, 7L -> 3L)
    val c = Map(5L -> 4L)
    assert(agg.merge(a, b) == agg.merge(b, a))
    assert(agg.merge(agg.merge(a, b), c) == agg.merge(a, agg.merge(b, c)))
    assert(agg.reduce(a, 1L) == Map(1L -> 3L, 5L -> 1L))
    assert(agg.reduce(agg.zero, 9L) == Map(9L -> 1L))
    assert(agg.merge(agg.zero, a) == a)
  }

  test("partition count does not change the result") {
    val rows = (1 to 500).map(i => ("g" + (i % 3), (i % 17).toLong))
    def run(parts: Int) =
      spark.createDataset(rows).toDF("g", "v").repartition(parts)
        .groupBy(col("g")).agg(Histogram.longHistogram(col("v")).as("h"))
        .select(col("g"), explode(col("h")).as(Seq("v", "c")))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(run(1) == run(32))
  }
}
