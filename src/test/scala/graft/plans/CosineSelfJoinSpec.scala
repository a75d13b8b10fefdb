package graft.plans

import graft.SparkSpec
import graft.operators.SimilarityJoin
import org.apache.spark.sql.functions._

import scala.util.Random

class CosineSelfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("physical operator appears in the plan and matches the kernel results") {
    val rnd = new Random(11)
    val data = (0L until 80L).map(i => (i, Array.fill(16)(rnd.nextDouble() * 2 - 1)))
    val df = data.toDF("vec_id", "v")
    val viaOp = CosineSelfJoin.pairs(df, "vec_id", "v", 0.2)
    assert(viaOp.queryExecution.executedPlan.toString.contains("CosineSelfJoin"))
    val a = viaOp.as[(Long, Long, Double)].collect().toSet
    val b = SimilarityJoin.cosinePairs(data.toDS(), 0.2)
      .as[(Long, Long, Double)].collect().toSet
    assert(a == b)
    assert(a.nonEmpty) // threshold chosen so random 16-dim vectors match
  }

  test("operator output composes with downstream relational ops") {
    val data = (0L until 30L).map(i => (i, Array.fill(8)(1.0 + i * 0.001)))
    val df = data.toDF("vec_id", "v")
    // near-identical vectors: every pair passes; aggregate downstream
    val agg = CosineSelfJoin.pairs(df, "vec_id", "v", 0.99)
      .groupBy(col("a_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("a_id"))
    val got = agg.as[(Long, Long)].collect()
    assert(got.head == ((0L, 29L)))
    assert(got.length == 29) // a_id 29 pairs with nothing above it
  }
}
