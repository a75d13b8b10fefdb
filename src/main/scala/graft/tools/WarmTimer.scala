package graft.tools

/** Warm-JVM per-query timer: runs the named queries repeatedly in ONE
  * session and prints each run's wall time. Complements graft.Bench
  * (fresh-JVM best-of-3, the committed artifact) when iterating on a
  * single query's plan: JIT/codegen warmup settles after ~2 rounds, so
  * round-3+ deltas isolate plan changes from JVM noise.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.WarmTimer q245_negative_sampling [more...]
  */
object WarmTimer {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("ERROR")
    for (round <- 1 to sys.env.getOrElse("WARM_ROUNDS", "5").toInt; q <- args) {
      val t0 = System.nanoTime()
      graft.Bench.action(graft.SparkEntry.queries(q)(s, d))
      println(f"$q r$round%-3s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      graft.core.Pins.release()
    }
    s.stop()
  }
}
