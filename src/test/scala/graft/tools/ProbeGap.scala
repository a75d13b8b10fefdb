package graft.tools

/** Scratch probe (r14): sample the MAIN (action-running) thread while a
  * query executes and histogram the deepest interesting frame — what is
  * the driver doing during the inter-job gaps? */
object ProbeGap {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args(0).split(',').toSeq
      else Seq("q121_curation_funnel")
    // warmup
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(s, d).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      finally graft.core.Pins.release()
    }
    val main = Thread.currentThread()
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        import scala.jdk.CollectionConverters._
        Thread.getAllStackTraces.asScala.foreach { case (th, st) =>
          if (th.getState == Thread.State.RUNNABLE && (th ne main) &&
              !th.getName.contains("sampler") && st.nonEmpty) {
            val f = st.find { e =>
              val c = e.getClassName
              !c.startsWith("jdk.") && !c.startsWith("java.") &&
                !c.startsWith("scala.concurrent") && !c.startsWith("sun.") &&
                !c.startsWith("io.netty")
            }.map(e => e.getClassName.split('.').takeRight(2).mkString(".") +
              "." + e.getMethodName)
            f.foreach { fr =>
              hist.merge(th.getName.replaceAll("\\d+", "N") + " :: " + fr, 1,
                (a: Integer, b: Integer) => a + b)
            }
          }
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    names.foreach { n =>
      (1 to 3).foreach { _ =>
        graft.SparkEntry.queries(n)(s, d).write.format("noop").mode("overwrite").save()
        graft.core.Pins.release()
      }
    }
    sampling = false
    Thread.sleep(100)
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (f, c) =>
      println(f"[gap] $c%5d  $f")
    }
    s.stop()
  }
}
