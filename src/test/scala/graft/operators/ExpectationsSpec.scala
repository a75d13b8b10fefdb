package graft.operators

import graft.SparkSpec
import graft.operators.Expectations.Rule
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("audit counts violations per rule in one scan; nulls violate") {
    val d = Seq(
      (1L, Some(10.0)), (2L, Some(-1.0)), (3L, None), (4L, Some(3.0)))
      .toDF("id", "v")
    val rows = Expectations.audit(d, Seq(
      Rule("v_positive", col("v") > 0),
      Rule("id_small", col("id") < 4)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("v_positive") == ((2L, 4L))) // -1 and null
    assert(rows("id_small") == ((1L, 4L)))   // id 4
  }

  test("danglingForeignKeys finds unmatched children, ignores null fks") {
    val child = Seq((1L, Some(10L)), (2L, Some(99L)), (3L, None))
      .toDF("id", "fk")
    val parent = Seq(10L, 11L).toDF("pk")
    val got = Expectations.danglingForeignKeys(
        child, col("fk"), parent, col("pk"))
      .select("id").as[Long].collect()
    assert(got.toSeq == Seq(2L))
  }
}
