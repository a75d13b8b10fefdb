package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.core.Tables

/** Scratch probe (r14): same-session A/B — q159 spread, q245 pre-fold
  * repartition. A = r13 form, B = current HEAD form. */
object ProbeAB2 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("ERROR")
    def tbl(name: String) = Tables.load(s, d, name)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def q159A(): Unit = {
      val docs = tbl("documents")
        .select(col("doc_id"), TextOps.shinglesNative(col("text"), 5).as("toks"))
      noop(graft.operators.PrefixFilterJoin.join(docs, "doc_id", "toks", 1, 2)
        .orderBy(col("a_id"), col("b_id")))
    }
    def q159B(): Unit =
      noop(graft.SparkEntry.queries("q159_prefix_filter_join")(s, d))

    def q245Common(posSets: DataFrame): DataFrame = {
      val parts = tbl("part").select(col("p_partkey"))
      val npv = Tables.rowCount(s, d, "part")
      val M = 4503599627370496L
      val T = math.min(M, M * 64 / npv)
      val k = math.min(52L, math.max(0L,
        55L - (63 - java.lang.Long.numberOfLeadingZeros(npv)))).toInt
      val W = 1L << k
      val nB = M / W
      def h52(prefix: String, c: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(lit(prefix), c.cast("string"))), 1, 13),
          16, 10).cast("long")
      val partsB = parts.withColumn("bp", h52("p|", col("p_partkey")))
        .withColumn("__bk", expr(s"bp div ${W}L"))
      val cand = posSets.withColumn("au", h52("u|", col("o_custkey")))
        .withColumn("lo", pmod(-col("au"), lit(M)))
        .withColumn("__bk", explode(array_distinct(expr(
          s"transform(sequence(lo div ${W}L, (lo + ${T - 1}L) div ${W}L)," +
            s" b -> pmod(b, ${nB}L))"))))
        .join(broadcast(partsB), Seq("__bk"))
        .withColumn("h", pmod(col("au") + col("bp"), lit(M)))
        .filter(col("h") < lit(T) && !array_contains(col("pset"), col("p_partkey")))
        .drop("__bk", "au", "bp", "lo", "pset")
      val top3 = graft.core.Pins.pin(cand
        .groupBy(col("o_custkey"))
        .agg(graft.operators.TopK.minKByLong(3)(col("h"), col("p_partkey"))
          .as("top3"))
        .select(col("o_custkey"), posexplode(col("top3")))
        .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rank"),
          col("col._2").as("neg_partkey"), col("col._1").as("h")))
      top3.orderBy(col("o_custkey"), col("rank"))
    }
    def q245A(): Unit = noop(q245Common(
      tbl("orders")
        .join(tbl("lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(collect_set(col("l_partkey")).as("pset"))))
    def q245B(): Unit =
      noop(graft.SparkEntry.queries("q245_negative_sampling")(s, d))

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
    ab("q159 spread", q159A _, q159B _)
    ab("q245 repart", q245A _, q245B _)
    s.stop()
  }
}
