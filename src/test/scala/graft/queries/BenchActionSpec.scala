package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Measurement-honesty pin for [[graft.Bench.action]].
  *
  * Round 6's action was `.count()`, under which Catalyst prunes every
  * unreferenced projection column and `EliminateSorts` drops the output
  * ordering — so scan-local projection queries (q60's shingle kernel,
  * q91's eight JL dot products, q146's LOCF window column) were measured
  * as little more than row-count scans while the DuckDB oracle
  * materialized the full result. This spec asserts, on the EXECUTED plan
  * of the bench action, that (a) every output column survives into the
  * executed plan (no pruning) and (b) the top-level Sort is retained —
  * and, as a non-vacuousness check, that the same assertion FAILS under
  * a `.count()` of the same query (proving the spec detects the
  * round-6 defect rather than passing trivially).
  */
class BenchActionSpec extends SparkSpec {

  /** Run `run` and return the executed-plan strings of every query
    * execution it triggered (the execution-listener bus is async, so
    * poll until quiescent). */
  private def capturePlans(run: => Unit): Seq[String] = {
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      run
      val t0 = System.currentTimeMillis()
      var last = -1
      while (System.currentTimeMillis() - t0 < 30000 &&
        (plans.isEmpty || plans.size != last)) {
        last = plans.size; Thread.sleep(200)
      }
    } finally spark.listenerManager.unregister(l)
    assert(!plans.isEmpty, "no query execution captured")
    import scala.jdk.CollectionConverters._
    plans.asScala.toSeq
  }

  /** The bench-action execution is the one that writes to the noop sink. */
  private def actionPlan(name: String): (String, Seq[String]) = {
    val df = graft.SparkEntry.queries(name)(spark, sf0001)
    val cols = df.columns.toSeq
    val plans = capturePlans(graft.Bench.action(df))
    val p = plans.filter(p0 =>
      p0.contains("noop") || p0.contains("OverwriteByExpression") ||
        p0.contains("AppendData"))
    assert(p.nonEmpty, s"no noop-write execution among ${plans.size} captured")
    (p.last, cols)
  }

  // the round-6 under-measured class: scan-local projections + a window
  // transform, each ending in an ORDER BY with no aggregate on top
  private val PrunedClass =
    Seq("q60_repetition", "q91_random_projection", "q146_forward_fill")

  for (name <- PrunedClass) {
    test(s"$name bench action evaluates every output column and the sort") {
      val (plan, cols) = actionPlan(name)
      val missing = cols.filterNot(plan.contains)
      assert(missing.isEmpty,
        s"output columns pruned from the bench-action plan: $missing")
      assert(plan.contains("Sort"),
        "output ORDER BY was eliminated from the bench-action plan")
      graft.core.Pins.release()
    }
  }

  test("the spec is not vacuous: .count() of q91 DOES prune the work") {
    val df = graft.SparkEntry.queries("q91_random_projection")(spark, sf0001)
    val plans = capturePlans { df.count(); () }
    // under count, at least one projected column and the sort must be
    // absent from every captured plan — otherwise this spec could never
    // have caught the round-6 defect it exists to prevent
    assert(plans.forall(p => !p.contains("p7") || !p.contains("Sort")),
      "expected count() to prune q91's projection columns or sort; " +
        "if Spark stopped pruning, the bench-action fix is moot — re-audit")
    graft.core.Pins.release()
  }
}
