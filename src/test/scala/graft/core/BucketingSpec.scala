package graft.core


import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the 100 TB plan for the recurring
  * orders⋈customer / dedup-by-hash joins (SURVEY §4 shuffle plan): both
  * sides bucketed on the join key join with ZERO Exchange in the plan,
  * versus two full shuffles unbucketed.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key self-side join plans without any Exchange") {
    val s = spark.newSession() // warehouse dir is the suite-wide temp dir
    s.conf.set("spark.sql.shuffle.partitions", 4)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force non-broadcast
    val orders = Tables.load(s, sf0001, "orders")
    orders.write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    val customers = Tables.load(s, sf0001, "customer")
    customers.write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")

    val joined = s.table("orders_b")
      .join(s.table("customer_b"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"))
    joined.collect() // force final (AQE) plan
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle either side (bucket layout feeds
    // the sort-merge join directly); the later groupBy on c_nationkey
    // legitimately exchanges once on its own key
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("hashpartitioning(o_custkey") &&
           !plan.contains("hashpartitioning(c_custkey"),
      s"bucketed join still shuffles its keys:\n$plan")

    // sanity: same result as the unbucketed join
    val expected = orders.join(customers, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
    assert(joined.collect().map(r => (r.getInt(0), r.getLong(1))).toSet ==
      expected.collect().map(r => (r.getInt(0), r.getLong(1))).toSet)
  }
}
