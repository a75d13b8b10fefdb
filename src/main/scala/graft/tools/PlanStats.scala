package graft.tools

/** One-off plan-statistics dump used to seed and refresh the
  * PlanAuditSpec ratchets: per query, the parquet-scan count and the
  * shuffle-Exchange count (broadcast exchanges listed separately —
  * they ship model-sized relations and are not the scale hazard the
  * ratchet guards). Run: `sbt "runMain graft.tools.PlanStats [prefix,...]"`.
  */
object PlanStats {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val only = args.headOption.map(_.split(',').toSeq)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val scans = plan.linesIterator.count(_.contains("Scan parquet"))
          val shuffles = plan.linesIterator.count(l =>
            l.contains("Exchange ") && !l.contains("BroadcastExchange"))
          val bcasts = plan.linesIterator.count(_.contains("BroadcastExchange"))
          println(f"$name%-28s scans=$scans shuffles=$shuffles broadcasts=$bcasts")
        } catch { case e: Throwable => println(s"$name ERR ${e.getMessage.take(80)}") }
        graft.core.Pins.release()
      }
    spark.stop()
  }
}
