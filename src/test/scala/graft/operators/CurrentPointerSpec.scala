package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Latest-per-group "current pointer" (/root/reference/download/
  * common.go:115-122, UpdateCurrent.sh): both formulations (max_by agg
  * and row_number window) must agree and pick the lexicographic max of
  * the order key.
  */
class CurrentPointerSpec extends SparkSpec {
  import spark.implicits._

  test("latest picks max (ts, id) per group; formulations agree") {
    for (seed <- 1 to 10) {
      val rnd = new Random(seed)
      val rows = (0 until rnd.nextInt(50) + 1).map { i =>
        (("d" + rnd.nextInt(4)), rnd.nextInt(10).toLong, i.toLong)
      }
      val d = rows.toDF("ds", "ts", "id")
      val viaAgg = CurrentPointer.latest(d, Seq(col("ds")),
          Seq(col("ts"), col("id")), struct(col("ts"), col("id")))
        .select(col("ds"), col("latest.ts"), col("latest.id"))
        .as[(String, Long, Long)].collect().toSet
      val viaWin = CurrentPointer.latestWindow(d, Seq(col("ds")),
          Seq(col("ts"), col("id")))
        .select("ds", "ts", "id").as[(String, Long, Long)].collect().toSet
      val naive = rows.groupBy(_._1).map { case (ds, rs) =>
        val (_, ts, id) = rs.maxBy(r => (r._2, r._3)); (ds, ts, id)
      }.toSet
      assert(viaAgg == naive, s"agg seed=$seed")
      assert(viaWin == naive, s"window seed=$seed")
    }
  }
}
