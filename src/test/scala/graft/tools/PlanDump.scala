package graft.tools

/** Dump `.explain("formatted")` for named queries to files — the
  * evidence artifact behind plans/r14/<query>_{before,after}.txt.
  * Run: `sbt "Test/runMain graft.tools.PlanDump <name[,name...]> <suffix> [outDir]"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val suffix = args(1)
    val outDir = if (args.length > 2) args(2) else "plans/r14"
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(s, d)
      val txt = s"===== $n ($suffix, r14) =====\n" +
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
      graft.core.Pins.release()
    }
    s.stop()
  }
}
