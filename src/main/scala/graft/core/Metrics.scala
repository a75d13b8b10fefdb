package graft.core

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Labeled metric vectors backed by Spark accumulators (operator O18 —
  * /root/reference/metrics/metrics.go:13-53): a success gauge plus
  * labeled failure/error counters, with the reference's metric names.
  *
  * Resolve counters ON THE DRIVER and capture the `LongAccumulator`
  * handle in the task closure (as ArchivePipeline does) — accumulators
  * then aggregate from executors for free. Calling `counter()` itself
  * from an executor is an error (the registration would never report
  * back), and [[counter]] fails fast if attempted.
  */
class Metrics(spark: SparkSession) extends Serializable {
  @transient private lazy val vecs = TrieMap.empty[(String, String), LongAccumulator]

  /** downloader_download_failed{source} */
  def downloadFailed(label: String): LongAccumulator =
    counter("downloader_download_failed", label)

  /** downloader_error_count{source} — row-level parse/cast errors. */
  def errorCount(label: String): LongAccumulator =
    counter("downloader_error_count", label)

  /** downloader_last_success gauge: set only when an entire iteration
    * succeeds (downloader.go:98-100). */
  def lastSuccess: LongAccumulator = counter("downloader_last_success", "")

  def counter(name: String, label: String): LongAccumulator = {
    require(org.apache.spark.TaskContext.get() == null,
      "Metrics.counter must be resolved on the driver; capture the " +
        "LongAccumulator handle in the task closure instead")
    vecs.getOrElseUpdate((name, label),
      spark.sparkContext.longAccumulator(if (label.isEmpty) name else s"$name{$label}"))
  }

  /** Snapshot of all counters, for assertion/export. */
  def snapshot: Map[String, Long] =
    vecs.iterator.map { case ((n, l), acc) =>
      val key = if (l.isEmpty) n else s"$n{$l}"
      key -> acc.value.longValue
    }.toMap
}
