package graft.tools

import org.apache.spark.scheduler._

/** Scratch probe (r14): what does a trivial query's ~0.3 s exec floor
  * consist of — how many jobs/stages/tasks, task time vs wall. */
object ProbeFloor2 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    val ev = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1; ev.add(("jobStart", j.time))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        ev.add(("jobEnd", j.time))
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += st.stageInfo.numTasks
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) taskMs += t.taskInfo.duration
    })
    val names = if (args.nonEmpty) args(0).split(',').toSeq
      else Seq("q33_date_arithmetic", "q07_top_k", "q90_outlier_fences",
        "q11_agg_tpch_pricing", "q13_window_analytic")
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(s, d).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      finally graft.core.Pins.release()
    }
    names.foreach { n =>
      (1 to 2).foreach { rep =>
        jobs = 0; stages = 0; tasks = 0; taskMs = 0L; ev.clear()
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(s, d)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        graft.core.Pins.release()
        Thread.sleep(200) // let listener drain
        println(f"[probe] $n%-24s rep$rep construct ${(t1 - t0) / 1e9}%5.3f " +
          f"exec ${(t2 - t1) / 1e9}%5.3f jobs $jobs%2d stages $stages%2d " +
          f"tasks $tasks%3d taskTime ${taskMs / 1e3}%6.2f s")
        // job timeline: per-job duration and the gap before it
        val tl = ev.toArray(Array.empty[(String, Long)]).sortBy(_._2)
        var lastEnd = -1L
        val parts = tl.grouped(2).collect {
          case Array(("jobStart", a), ("jobEnd", b)) =>
            val gap = if (lastEnd < 0) 0L else a - lastEnd
            lastEnd = b
            f"gap ${gap}ms run ${b - a}ms"
        }
        println(s"[probe]   timeline: ${parts.mkString(" | ")}")
      }
    }
    s.stop()
  }
}
