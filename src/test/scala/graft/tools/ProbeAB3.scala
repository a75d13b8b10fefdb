package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextOps
import graft.core.Tables

/** Scratch probe (r14): same-session A/B — q293 spread, q103 spread,
  * q142 driver replay. A = r13 form, B = current HEAD form. */
object ProbeAB3 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("ERROR")
    def tbl(name: String) = Tables.load(s, d, name)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def run(name: String): Unit =
      noop(graft.SparkEntry.queries(name)(s, d))

    def q103A(): Unit = {
      val fp = tbl("documents").filter(length(col("text")) >= 5)
        .select(col("doc_id"),
          explode(TextOps.winnowFingerprints(col("text"), 5, 4)).as("fp"))
      noop(fp.withColumn("nd", count(lit(1)).over(Window.partitionBy(col("fp"))))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_fp"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
        .withColumn("shared_ratio",
          round(col("n_shared").cast("double") / col("n_fp"), 4))
        .orderBy(col("doc_id")))
    }
    def q142A(): Unit = {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val trans = tbl("events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("n"))
      val tp = graft.core.Pins.pin(
        trans.join(trans.groupBy(col("prev")).agg(sum(col("n")).as("rs")), "prev"))
      val states = tp.select(col("prev").as("state")).distinct()
      val nStates = states.count()
      var p = states.withColumn("p", lit(1000000L / nStates))
      for (_ <- 1 to 3) {
        p = tp.join(broadcast(p.withColumnRenamed("state", "prev")), "prev")
          .select(col("next").as("state"), expr("(p * n) div rs").as("m"))
          .groupBy(col("state")).agg(sum(col("m")).as("p"))
      }
      noop(p.select(col("state"), col("p").as("p_micro")).orderBy(col("state")))
    }
    def q293A(): Unit = {
      import graft.queries.PipelineQueries._
      val docs = checksumMelt(tbl("documents"), "documents", documentsChecksumCols)
      val ords = checksumMelt(tbl("orders"), "orders", Seq(
        "o_orderkey" -> col("o_orderkey"), "o_custkey" -> col("o_custkey"),
        "o_orderstatus" -> col("o_orderstatus"),
        "o_totalprice" -> expr("CAST(round(o_totalprice * 100) AS BIGINT)"),
        "o_orderdate" -> unix_micros(col("o_orderdate")),
        "o_orderpriority" -> col("o_orderpriority")))
      noop(checksumDigest(checksumFold(docs.unionByName(ords))))
    }

    def ab(label: String, a: () => Unit, b: () => Unit, n: Int = 5): Unit = {
      a(); graft.core.Pins.release()
      b(); graft.core.Pins.release()
      var bestA = Double.MaxValue; var bestB = Double.MaxValue
      val as = new scala.collection.mutable.ArrayBuffer[Double]
      val bs = new scala.collection.mutable.ArrayBuffer[Double]
      (1 to n).foreach { _ =>
        var t0 = System.nanoTime(); a(); graft.core.Pins.release()
        val da = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); b(); graft.core.Pins.release()
        val db = (System.nanoTime() - t0) / 1e9
        as += da; bs += db
        bestA = math.min(bestA, da); bestB = math.min(bestB, db)
      }
      println(f"[probe] $label%-12s A best $bestA%6.3f ${as.map(x => f"$x%.2f").mkString(",")} | " +
        f"B best $bestB%6.3f ${bs.map(x => f"$x%.2f").mkString(",")}")
    }
    ab("q103 spread", q103A _, () => run("q103_winnowing"))
    ab("q142 driver", q142A _, () => run("q142_stationary_markov"))
    ab("q293 spread", q293A _, () => run("q293_column_checksums"))
    s.stop()
  }
}
