package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Scratch A/B harness (r15): q189 — A = r14 pin + collect_list median +
  * global window form, B = HEAD driver replay. */
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("ERROR")
    def t(n: String) = Tables.load(s, d, n)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def run(name: String): Unit =
      noop(graft.SparkEntry.queries(name)(s, d))

    def q189A(): Unit = {
      val daily = graft.core.Pins.pin(
        t("events")
          .select(to_date(col("ts")).as("day"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy(col("day")).agg(sum(col("cents")).as("daily_cents")))
      val med = daily
        .agg(sort_array(collect_list(col("daily_cents"))).as("v"))
        .select(element_at(col("v"),
          (((size(col("v")) - 1) / 2) + 1).cast("int")).as("m"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      noop(daily.crossJoin(broadcast(med))
        .withColumn("p_hi",
          sum(col("daily_cents") - col("m") - expr("m div 20")).over(w))
        .withColumn("p_lo",
          sum(col("m") - col("daily_cents") - expr("m div 20")).over(w))
        .withColumn("cusum_hi_cents",
          col("p_hi") - least(min(col("p_hi")).over(w), lit(0L)))
        .withColumn("cusum_lo_cents",
          col("p_lo") - least(min(col("p_lo")).over(w), lit(0L)))
        .select(col("day"), col("daily_cents"),
          col("cusum_hi_cents"), col("cusum_lo_cents"),
          (col("cusum_hi_cents") > expr("m div 2")).cast("long").as("alarm_hi"),
          (col("cusum_lo_cents") > expr("m div 2")).cast("long").as("alarm_lo"))
        .orderBy(col("day")))
    }

    def ab(label: String, a: () => Unit, b: () => Unit, n: Int = 7): Unit = {
      a(); graft.core.Pins.release()
      b(); graft.core.Pins.release()
      val as = new scala.collection.mutable.ArrayBuffer[Double]
      val bs = new scala.collection.mutable.ArrayBuffer[Double]
      (1 to n).foreach { _ =>
        var t0 = System.nanoTime(); a(); graft.core.Pins.release()
        as += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); b(); graft.core.Pins.release()
        bs += (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-12s A best ${as.min}%6.3f ${as.map(x => f"$x%.2f").mkString(",")} | " +
        f"B best ${bs.min}%6.3f ${bs.map(x => f"$x%.2f").mkString(",")}")
    }
    ab("q189 replay", q189A _, () => run("q189_cusum"))
    s.stop()
  }
}
