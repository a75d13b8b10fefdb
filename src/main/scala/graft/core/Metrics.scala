package graft.core

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Labeled metric vectors backed by Spark accumulators (operator O18 —
  * /root/reference/metrics/metrics.go:13-53): the all-success gauge plus
  * labeled failure/error counters, under the reference's exact
  * Prometheus metric/label names.
  *
  * Resolve counters ON THE DRIVER and capture the `LongAccumulator`
  * handle in the task closure (as ArchivePipeline does) — accumulators
  * then aggregate from executors for free. Calling `counter()` itself
  * from an executor is an error (the registration would never report
  * back), and [[counter]] fails fast if attempted.
  *
  * Gauges are driver-state (the reference sets `LastSuccessTime` from
  * the main loop only, downloader.go:98-100), so a plain atomic — no
  * executor aggregation needed.
  */
class Metrics(spark: SparkSession) extends Serializable {
  @transient private lazy val vecs =
    TrieMap.empty[(String, String, String), LongAccumulator]
  @transient private lazy val gauges = TrieMap.empty[String, AtomicLong]

  /** downloader_download_failed_total{download_type} — a download maxed
    * out its retries (metrics.go:27-34). */
  def downloadFailed(downloadType: String): LongAccumulator =
    counter("downloader_download_failed_total", "download_type", downloadType)

  /** downloader_error_total{source} — row-level parse/cast/fetch errors
    * (metrics.go:36-43). */
  def errorCount(source: String): LongAccumulator =
    counter("downloader_error_total", "source", source)

  /** downloader_downloader_routeviews_url_error_total{source} — manifest
    * retrieval/parse errors (metrics.go:45-52). */
  def routeviewsUrlError(source: String): LongAccumulator =
    counter("downloader_downloader_routeviews_url_error_total", "source", source)

  /** downloader_last_success_time_seconds: set only when an ENTIRE
    * iteration succeeds (downloader.go:98-100). */
  def markAllSuccess(epochSeconds: Long): Unit =
    setGauge("downloader_last_success_time_seconds", epochSeconds)

  def setGauge(name: String, value: Long): Unit =
    gauges.getOrElseUpdate(name, new AtomicLong()).set(value)

  def counter(name: String, labelKey: String, labelValue: String): LongAccumulator = {
    require(org.apache.spark.TaskContext.get() == null,
      "Metrics.counter must be resolved on the driver; capture the " +
        "LongAccumulator handle in the task closure instead")
    vecs.getOrElseUpdate((name, labelKey, labelValue),
      spark.sparkContext.longAccumulator(
        if (labelValue.isEmpty) name else s"$name{$labelValue}"))
  }

  /** Snapshot of all counters and gauges, keyed `name` or
    * `name{labelValue}`, for assertion/export. */
  def snapshot: Map[String, Long] = {
    val cs = vecs.iterator.map { case ((n, _, v), acc) =>
      val key = if (v.isEmpty) n else s"$n{$v}"
      key -> acc.value.longValue
    }
    val gs = gauges.iterator.map { case (n, v) => n -> v.get() }
    (cs ++ gs).toMap
  }

  /** Prometheus text exposition (one `name{key="value"} n` line per
    * series, gauges bare) — what a /metrics endpoint or textfile
    * collector serves. Label values escape backslash, quote and newline
    * per the text-format spec (error-message-derived labels would
    * otherwise invalidate the whole exposition). Deterministic ordering
    * for testability. */
  def render: String = {
    def esc(v: String): String =
      v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
    val counterLines = vecs.iterator.map { case ((n, k, v), acc) =>
      val series = if (v.isEmpty) n else s"""$n{$k="${esc(v)}"}"""
      s"$series ${acc.value.longValue}"
    }
    val gaugeLines = gauges.iterator.map { case (n, v) => s"$n ${v.get()}" }
    (counterLines ++ gaugeLines).toSeq.sorted.mkString("", "\n", "\n")
  }
}
