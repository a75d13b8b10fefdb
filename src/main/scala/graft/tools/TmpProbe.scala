package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.core.Tables

/** Scratch A/B harness (r15): q300 — B spreads the single-split
  * lineitem scan before the 20-decimal-moment fold (q296's win shape:
  * heavy per-row partial agg, no pin downstream). */
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

    def q300B(): Unit = {
      val feats = Seq("qty", "dollars", "disc_centi", "tax_centi", "ship_day")
      val dec = "DECIMAL(38,0)"
      val base = graft.operators.MinHashLsh.spreadSmallInput(t("lineitem")).select(
        expr("CAST(round(l_quantity) AS BIGINT)").as("qty"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 100")
          .as("dollars"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("disc_centi"),
        expr("CAST(round(l_tax * 100) AS BIGINT)").as("tax_centi"),
        expr("unix_micros(l_shipdate) div 86400000000").as("ship_day"))
      val moments = base.agg(
        count(lit(1)).as("n"),
        (feats.map(f => sum(col(f)).as(s"s_$f")) ++
          (for (i <- feats.indices; j <- i until feats.length) yield {
            val (a, b) = (feats(i), feats(j))
            sum((col(a) * col(b)).cast(dec)).as(s"q_${a}_${b}")
          })): _*)
      def D(c: String) = s"CAST($c AS $dec)"
      val pairRows = for (i <- feats.indices; j <- (i + 1) until feats.length)
        yield {
          val (a, b) = (feats(i), feats(j))
          s"""named_struct('f1', '$a', 'f2', '$b',
              'cov', ${D("n")} * q_${a}_${b} - ${D(s"s_$a")} * s_$b,
              'varx', ${D("n")} * q_${a}_${a} - ${D(s"s_$a")} * s_$a,
              'vary', ${D("n")} * q_${b}_${b} - ${D(s"s_$b")} * s_$b)"""
        }
      noop(moments
        .select(col("n"),
          explode(expr(pairRows.mkString("array(", ", ", ")"))).as("p"))
        .select(col("p.f1").as("f1"), col("p.f2").as("f2"), col("n"),
          when(col("p.cov") > 0, 1L).when(col("p.cov") < 0, -1L)
            .otherwise(0L).as("cov_sign"),
          when(col("p.varx") === 0 || col("p.vary") === 0, lit(0.0))
            .otherwise(round(col("p.cov").cast("double") /
              sqrt(col("p.varx").cast("double") * col("p.vary").cast("double")),
              4)).as("r"))
        .orderBy(col("f1"), col("f2")))
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
    ab("q300 spread", () => run("q300_corr_matrix"), q300B _)
    s.stop()
  }
}
