package graft.tools

import org.apache.spark.sql.functions._

/** Scratch stage probe for q304 (round 13): decomposes the wall and
  * witnesses the three rejected formulations' numbers (PLANS § q304).
  * Findings pinned here: (1) a dot>0 filter placed before the top-2
  * window is pushed INTO the broadcast join condition and evaluates
  * the dot kernel twice per probed pair; (2) Spark's `round` on DOUBLE
  * allocates a BigDecimal per array element inside a HOF lambda and an
  * outer-column sqrt re-evaluates per element — the sign-split floor
  * with a hoisted scale column is 2.5× cheaper; (3) a typed top-2
  * aggregator bills its Seq buffer encoder per candidate (2.6 s) and a
  * pinned two-pass max-struct pays the candidate checkpoint write
  * (2.3 s) — the single slim window exchange wins (1.2 s total).
  */
object TmpQ304 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32, Map.empty)
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = graft.SparkEntry.queries("q304_margin_mining")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      graft.core.Pins.release()
    }
    import graft.queries.PipelineQueries
    graft.Bench.action(fn(spark, d)); graft.core.Pins.release() // warmup
    for (r <- 1 to 3) time(s"full q304          r$r")(
      graft.Bench.action(fn(spark, d)))
    time("assigned count")(
      PipelineQueries.q304Assigned(spark, d).count(): Unit)
    time("un build")(graft.Bench.action(PipelineQueries.q304Un(spark, d)))
    time("cand dots")(graft.Bench.action(PipelineQueries.q304Cand(spark, d)))
    val c = PipelineQueries.q304Cand(spark, d)
    println("cand rows = " + c.count())
    graft.core.Pins.release()
    spark.stop()
  }
}
