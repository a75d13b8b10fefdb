package graft.plans

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession

import graft.core.{Metrics, MetricsHttpEndpoint, MetricsPublisher, MetricsSink}
import graft.sources.{HttpFetcher, Store}

/** A manifest-driven feed: the routeviews shape (manifest URL + per-file
  * fetch) of /root/reference/downloader.go:70-96. */
case class ManifestFeed(cfg: SourceConfig, manifestUrl: String)

/** A fixed-file feed: the maxmind shape (one URL, timestamped archive
  * key) of /root/reference/downloader.go:71-75. */
case class FixedFeed(cfg: SourceConfig, url: String)

/** The complete runnable service — the reference-equivalent daemon
  * (/root/reference/downloader.go:59-103) composed from the engine's
  * parts: production HTTP fetcher, durable store, per-iteration metrics
  * publication, the all-success gauge gating, uniform-jitter scheduling
  * — plus one deliberate improvement: the per-feed WATERMARK IS
  * PERSISTED IN THE STORE (`_meta/watermark/<dataset>`), so a restart
  * resumes where the last successful run stopped instead of
  * re-fetching from zero (the reference's process-local ints reset on
  * restart, downloader.go:61-62 — dedup made that survivable, not
  * free).
  */
object Downloader {

  private def watermarkKey(dataset: String) = s"_meta/watermark/$dataset"

  /** Load the persisted watermark. ONLY a missing key (first run) maps
    * to 0 — a transient store read failure or corrupt content must FAIL
    * the feed rather than silently reset the watermark and re-fetch the
    * entire feed history through a degraded run. */
  def loadWatermark(store: Store, dataset: String): Long =
    try new String(store.read(watermarkKey(dataset)), UTF_8).trim.toLong
    catch {
      case _: NoSuchElementException | _: java.io.FileNotFoundException |
           _: java.nio.file.NoSuchFileException => 0L
    }

  def saveWatermark(store: Store, dataset: String, wm: Long): Unit =
    store.write(watermarkKey(dataset), wm.toString.getBytes(UTF_8))

  /** One iteration over every feed. Returns per-feed success (the
    * all-success AND gates the gauge upstream). Manifest retrieval or
    * parse failure counts into the reference's routeviews-url error
    * vector and fails the feed without touching its watermark. */
  def runOnce(spark: SparkSession,
              store: Store,
              fetcher: HttpFetcher,
              metrics: Metrics,
              manifestFeeds: Seq[ManifestFeed],
              fixedFeeds: Seq[FixedFeed],
              now: () => java.time.Instant = () => java.time.Instant.now()): Seq[Boolean] = {
    val manifestResults = manifestFeeds.map { f =>
      val ds = f.cfg.dataset
      val body =
        try Right(fetcher.fetchString(f.manifestUrl))
        catch {
          case scala.util.control.NonFatal(e) =>
            metrics.routeviewsUrlError("Couldnt get list").add(1)
            Left(e)
        }
      body match {
        case Left(_) => false
        case Right(text) =>
          try {
            val wm = loadWatermark(store, ds)
            val report = ArchivePipeline.run(
              spark, text, f.manifestUrl, f.cfg, store, wm, fetcher, metrics)
            if (report.newWatermark > wm) saveWatermark(store, ds, report.newWatermark)
            report.failed.isEmpty
          } catch {
            case scala.util.control.NonFatal(_) =>
              metrics.downloadFailed(ds).add(1)
              false
          }
      }
    }
    val fixedResults = fixedFeeds.map { f =>
      ArchivePipeline.runFixedSource(f.cfg, f.url, store, fetcher, now()) match {
        case Right(_) => true
        case Left(_) =>
          metrics.downloadFailed(f.cfg.dataset).add(1)
          false
      }
    }
    manifestResults ++ fixedResults
  }

  /** The eternal loop: `iterations = Int.MaxValue` for the service form.
    * Publishes metrics every iteration and sets the all-success gauge
    * exactly like downloader.go:98-100. */
  def loop(spark: SparkSession,
           store: Store,
           fetcher: HttpFetcher,
           metrics: Metrics,
           sink: MetricsSink,
           manifestFeeds: Seq[ManifestFeed],
           fixedFeeds: Seq[FixedFeed],
           iterations: Int,
           interval: scala.concurrent.duration.FiniteDuration =
             scala.concurrent.duration.DurationInt(24).hours,
           deviation: scala.concurrent.duration.FiniteDuration =
             scala.concurrent.duration.DurationInt(4).hours,
           sleep: scala.concurrent.duration.FiniteDuration => Unit =
             d => Thread.sleep(d.toMillis),
           clock: () => Long = () => System.currentTimeMillis() / 1000L): Seq[Boolean] = {
    val publisher = new MetricsPublisher(spark, metrics, sink)
    Scheduler.loop(
      // one composite source per iteration: feed-level successes fold
      // into the iteration verdict exactly like the reference's lastErr
      sources = Seq(() =>
        runOnce(spark, store, fetcher, metrics, manifestFeeds, fixedFeeds)
          .forall(identity)),
      iterations = iterations,
      onAllSuccess = () => metrics.markAllSuccess(clock()),
      onIteration = (_, _) => publisher.publishNow(),
      interval = interval, deviation = deviation, sleep = sleep)
  }

  /** Service entry: graft.plans.Downloader <storeRoot> <manifestUrl>.
    * Serves /metrics on GRAFT_METRICS_PORT (default 9090); Basic Auth
    * from GRAFT_AUTH_USER/GRAFT_AUTH_PASS (the maxmind licence-key
    * pattern). */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Downloader <storeRootUri> <manifestUrl>")
    val spark = graft.core.Sessions.local(sys.env.getOrElse("GRAFT_CPUS", "8").toInt)
    val store = new graft.sources.HadoopFsStore(args(0))
    val fetcher = HttpFetcher(
      sys.env.get("GRAFT_AUTH_USER"), sys.env.get("GRAFT_AUTH_PASS"))
    val metrics = new Metrics(spark)
    val endpoint = new MetricsHttpEndpoint(metrics,
      sys.env.getOrElse("GRAFT_METRICS_PORT", "9090").toInt).start()
    val feed = ManifestFeed(SourceConfig(
      dataset = "RouteViewIPv4",
      pathPrefix = "RouteViewIPv4/",
      currentName = "RouteViewIPv4/current/routeviews.pfx2as.gz",
      urlRegex = Some(new scala.util.matching.Regex(""".*(\d{4}/\d{2}/)(.*)""")),
      dedupScopeRegex = new scala.util.matching.Regex("""(.*)""")), args(1))
    try loop(spark, store, fetcher, metrics, new graft.core.TextFileMetricsSink(
        sys.env.getOrElse("GRAFT_METRICS_FILE", "/tmp/graft_metrics.prom")),
      Seq(feed), Nil, iterations = Int.MaxValue)
    finally { endpoint.stop(); spark.stop() }
  }
}
