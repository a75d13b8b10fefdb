package graft.core

import org.apache.spark.sql.DataFrame

/** Registry for QUERY-SCOPED `localCheckpoint` pins.
  *
  * Iterative and multi-consumer queries (q52's label propagation, q89's
  * shared counts, the q93/q99/q100 graph builds) pin an intermediate
  * relation so its consumers read materialized blocks instead of each
  * replanning the lineage. The blocks, however, live in the block
  * manager until the RDD is unpersisted — `Dataset.unpersist` does NOT
  * release them (it only clears CacheManager entries) — so a long-lived
  * session running many queries strands storage at a rate proportional
  * to queries run: the same leak class the bounded model cache fixes
  * with unpersist-on-evict, but for per-query (not per-artifact) pins.
  *
  * Protocol: queries create pins through [[pin]]; a DRIVER (Verify,
  * Bench, a REPL user) calls [[release]] after it has fully consumed a
  * query's result. Release invalidates every pinned frame created since
  * the previous release — callers must not retain references across the
  * boundary. Ingest-time artifacts owned by the bounded model caches
  * (inverted index, PQ codes, media features) are deliberately NOT
  * routed here: their lifetime is the cache entry's, released on
  * eviction or clear().
  */
object Pins {

  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Checkpoint `df` (eager, as `localCheckpoint` is) and register the
    * pinned frame for the next [[release]]. */
  def pin(df: DataFrame): DataFrame = track(df.localCheckpoint())

  /** Register an already-checkpointed frame for the next [[release]] —
    * for call sites that manage WHEN to checkpoint but not when to
    * free (e.g. the final round of an iterative loop, consumed lazily
    * by the caller). */
  def track(df: DataFrame): DataFrame = { live.add(df); df }

  /** Unpersist the RDD behind one checkpointed frame immediately. The
    * frame is unusable afterwards (lineage is truncated at the
    * checkpoint); callers release only frames nothing will read again —
    * e.g. a superseded iteration round. */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }

  /** Free every pinned frame registered since the last release. */
  def release(): Unit = {
    var d = live.poll()
    while (d != null) { releaseCheckpoint(d); d = live.poll() }
  }
}
