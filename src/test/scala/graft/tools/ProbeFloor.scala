package graft.tools

/** Scratch probe (r14): decompose the per-query bench floor —
  * construction vs planning vs execution — on cheap tail queries. */
object ProbeFloor {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("ERROR")
    val names = Seq("q33_date_arithmetic", "q07_top_k", "q34_string_funcs",
      "q90_outlier_fences", "q137_rfm_segments", "q148_association_rules")
    // warmup
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(s, d).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      finally graft.core.Pins.release()
    }
    names.foreach { n =>
      var tc = 0.0; var tp = 0.0; var te = 0.0
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(s, d)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        graft.core.Pins.release()
        tc += (t1 - t0) / 1e9; tp += (t2 - t1) / 1e9; te += (t3 - t2) / 1e9
      }
      println(f"[probe] $n%-28s construct ${tc / 3}%6.3f  plan ${tp / 3}%6.3f  exec ${te / 3}%6.3f")
    }
    s.stop()
  }
}
