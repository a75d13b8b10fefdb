package graft.plans

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

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

  /** The STRUCTURED-STREAMING form of the daemon:
    * `readStream.format("graft-manifest")` →
    * `foreachBatch(ArchivePipeline.ingest)`. Here the source's
    * checkpointed seqnum offset IS the watermark — one engine-managed
    * authority (no `_meta/watermark` key, no second copy of the
    * invariant; the driver-loop form and this one implement the same
    * reference semantics, downloader.go:59-103, but this one lets the
    * engine own the state).
    *
    * Each micro-batch carries exactly the manifest rows above the
    * restored offset; its files fetch/dedup/promote through the same
    * pipeline tail as the loop form. A batch containing FAILED files
    * throws, so the offset does NOT commit and a restart replays the
    * same rows — the streaming analog of the gated watermark advance
    * (routeviews.go:56-62). Replays are safe because archive writes are
    * idempotent by key and dedup is content-hash based. Collecting the
    * batch rows driver-side mirrors [[ArchivePipeline.run]]: they are
    * manifest METADATA (seqnum, url); the heavy per-file fetch fans out
    * in executor tasks inside `ingest`.
    */
  def stream(spark: SparkSession,
             store: Store,
             fetcher: graft.plans.Fetcher,
             metrics: Metrics,
             feed: ManifestFeed,
             checkpointDir: String,
             trigger: Trigger = Trigger.AvailableNow(),
             onBatchSuccess: Long => Unit = _ => ()): StreamingQuery = {
    val processBatch: (Dataset[Row], Long) => Unit = { (batch, batchId) =>
      import batch.sparkSession.implicits._
      val items = batch.select(col("seqnum"), col("url"))
        .as[(Long, String)].collect().toSeq
      if (items.nonEmpty) {
        val report = ArchivePipeline.ingest(
          spark, items, feed.cfg, store, fetcher, metrics)
        if (report.failed.nonEmpty)
          throw new IllegalStateException(
            s"${report.failed.size} file(s) failed " +
            s"(seqnums ${report.failed.mkString(",")}); batch not " +
            "committed — a restart replays it (gated-advance semantics)")
      }
      // The streaming analog of the loop form's per-iteration hook: with
      // Trigger.ProcessingTime a healthy query NEVER terminates, so
      // metrics publication / all-success marking must happen per
      // successful batch — publishing only after awaitTermination would
      // publish only on failure.
      onBatchSuccess(batchId)
    }
    spark.readStream.format("graft-manifest")
      .option("url", feed.manifestUrl).load()
      .writeStream
      .queryName(s"graft-downloader-${feed.cfg.dataset}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(processBatch)
      .start()
  }

  /** Build the per-iteration feed list from a config string — the
    * reference daemon's deployed shape is THREE sources per iteration
    * (MaxMind fixed files + RouteViews IPv4 + IPv6 manifests,
    * /root/reference/downloader.go:71-96); this makes that wiring
    * config, not code. Entries separated by `;`, fields by `|`:
    *
    *  - `manifest|<dataset>|<manifestUrl>` — a routeviews-shaped feed:
    *    archive prefix `<dataset>/`, current pointer
    *    `<dataset>/current/routeview.pfx2as.gz`, the reference's URL
    *    regex (routeviews.go:18) and whole-archive dedup scope
    *    (routeviews.go:19).
    *  - `fixed|<dataset>|<filename>|<url>` — a maxmind-shaped feed:
    *    fixed filename under a UTC date directory, current pointer
    *    `<dataset>/current/<filename>`, per-date-directory dedup scope
    *    (maxmind.go:13 — its regex's group 1 is the date directory).
    */
  def parseFeeds(spec: String): (Seq[ManifestFeed], Seq[FixedFeed]) = {
    val entries = spec.split(';').map(_.trim).filter(_.nonEmpty).toSeq
    val parsed = entries.map { e =>
      e.split('|').toSeq match {
        case Seq("manifest", ds, url) =>
          Left(ManifestFeed(routeviewsConfig(ds), url))
        case Seq("fixed", ds, filename, url) =>
          Right(FixedFeed(SourceConfig(
            dataset = ds,
            pathPrefix = s"$ds/",
            currentName = s"$ds/current/$filename",
            fixedFilename = Some(filename),
            dedupScopeRegex = new scala.util.matching.Regex("""(.*/).*/.*""")),
            url))
        case other => throw new IllegalArgumentException(
          s"bad feed entry '${other.mkString("|")}' — expected " +
            "manifest|<dataset>|<url> or fixed|<dataset>|<filename>|<url>")
      }
    }
    (parsed.collect { case Left(m) => m }, parsed.collect { case Right(f) => f })
  }

  /** The routeviews feed shape (download/routeviews.go:45-56). */
  def routeviewsConfig(dataset: String): SourceConfig = SourceConfig(
    dataset = dataset,
    pathPrefix = s"$dataset/",
    currentName = s"$dataset/current/routeview.pfx2as.gz",
    urlRegex = Some(new scala.util.matching.Regex(""".*(\d{4}/\d{2}/)(.*)""")),
    dedupScopeRegex = new scala.util.matching.Regex("""(.*)"""))

  /** Service entry: graft.plans.Downloader <storeRootUri> <manifestUrl>.
    * Serves /metrics on GRAFT_METRICS_PORT (default 9090); Basic Auth
    * from GRAFT_AUTH_USER/GRAFT_AUTH_PASS (the maxmind licence-key
    * pattern).
    *
    * GRAFT_FEEDS (see [[parseFeeds]]) replaces the single-feed CLI with
    * the reference's multi-source iteration — e.g. the deployed
    * reference daemon is
    * `manifest|RouteViewIPv4|http://…/pfx2as-creation.log;
    *  manifest|RouteViewIPv6|http://…6…/pfx2as-creation.log;
    *  fixed|Maxmind|GeoLite2-City.tar.gz|https://…/download?suffix=tar.gz`
    * — with the all-success gauge set only when EVERY feed's iteration
    * succeeds (downloader.go:98-100). Without GRAFT_FEEDS, args(1) is a
    * single RouteViews-shaped manifest URL (unchanged contract).
    *
    * With GRAFT_CHECKPOINT set, runs the streaming form ([[stream]]):
    * the engine checkpoint at that path is the single watermark
    * authority, triggering every GRAFT_INTERVAL_MS (default 24 h). A
    * failed batch terminates the query WITHOUT committing its offset;
    * the supervision loop below restarts it after a short backoff, so
    * the failed files replay — the daemon-level equivalent of the
    * reference retrying un-advanced seqnums next iteration. Without
    * GRAFT_CHECKPOINT, runs the driver-loop form with store-persisted
    * watermarks. */
  def main(args: Array[String]): Unit = {
    // Operational subcommand, the reference's UpdateCurrent.sh crash
    // recovery: re-derive a current pointer from the listing and exit.
    if (args.headOption.contains("repair-current")) {
      require(args.length == 5, "usage: Downloader repair-current " +
        "<storeRootUri> <prefix> <suffix> <currentName>")
      val store = new graft.sources.HadoopFsStore(args(1))
      graft.operators.CurrentPointer.repair(store, args(2), args(3), args(4)) match {
        case Some(src) => println(s"promoted $src -> ${args(4)}")
        case None =>
          System.err.println(s"no candidate under ${args(2)} matching *${args(3)}")
          sys.exit(2)
      }
      return
    }
    require(args.length >= 1, "usage: Downloader <storeRootUri> [<manifestUrl>]")
    val spark = graft.core.Sessions.local(sys.env.getOrElse("GRAFT_CPUS", "8").toInt)
    val store = new graft.sources.HadoopFsStore(args(0))
    val fetcher = HttpFetcher(
      sys.env.get("GRAFT_AUTH_USER"), sys.env.get("GRAFT_AUTH_PASS"))
    val metrics = new Metrics(spark)
    val endpoint = new MetricsHttpEndpoint(metrics,
      sys.env.getOrElse("GRAFT_METRICS_PORT", "9090").toInt).start()
    val (manifestFeeds, fixedFeeds) = sys.env.get("GRAFT_FEEDS") match {
      case Some(spec) => parseFeeds(spec)
      case None =>
        require(args.length >= 2,
          "usage: Downloader <storeRootUri> <manifestUrl> (or set GRAFT_FEEDS)")
        (Seq(ManifestFeed(routeviewsConfig("RouteViewIPv4"), args(1))), Nil)
    }
    try sys.env.get("GRAFT_CHECKPOINT") match {
      case Some(ckpt) =>
        val interval = sys.env.getOrElse("GRAFT_INTERVAL_MS",
          (24L * 3600 * 1000).toString).toLong
        val publisher = new MetricsPublisher(spark, metrics,
          new graft.core.TextFileMetricsSink(
            sys.env.getOrElse("GRAFT_METRICS_FILE", "/tmp/graft_metrics.prom")))
        require(fixedFeeds.isEmpty,
          "fixed feeds are loop-scheduled — run them without " +
            "GRAFT_CHECKPOINT (a fixed feed has no offset to checkpoint)")
        // the all-success gauge folds over EVERY feed, exactly like the
        // loop form (downloader.go:98-100): each query flips its own
        // health bit per batch; the gauge marks only when all are true
        val health = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
        manifestFeeds.foreach(f => health.put(f.cfg.dataset, false))
        def onFeedSuccess(ds: String): Unit = {
          health.put(ds, true)
          if (manifestFeeds.forall(f => health.get(f.cfg.dataset)))
            metrics.markAllSuccess(System.currentTimeMillis() / 1000L)
          publisher.publishNow()
        }
        // one query per manifest feed, each with its own checkpoint
        // subdirectory (per-feed offset authority, like the reference's
        // per-feed lastDownloaded ints); supervision restarts ONLY the
        // feeds whose query died — a healthy sibling keeps running (a
        // failed batch never committed its offset, so the restart
        // replays it: gated-advance semantics)
        val running = scala.collection.mutable.Map.empty[String, StreamingQuery]
        // exactly one feed keeps the BARE ckpt root — the pre-multi-feed
        // layout — so a single-feed deployment upgrading in place resumes
        // its existing offset/watermark history instead of silently
        // starting a fresh checkpoint under ckpt/<dataset>
        def ckptPath(f: ManifestFeed): String =
          if (manifestFeeds.size == 1) ckpt else s"$ckpt/${f.cfg.dataset}"
        def startFeed(f: ManifestFeed): Unit =
          running(f.cfg.dataset) = stream(spark, store, fetcher, metrics, f,
            ckptPath(f), Trigger.ProcessingTime(interval),
            onBatchSuccess = _ => onFeedSuccess(f.cfg.dataset))
        manifestFeeds.foreach(startFeed)
        while (true) {
          try spark.streams.awaitAnyTermination()
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"stream failed (will replay batch): ${e.getMessage}")
          }
          spark.streams.resetTerminated()
          val dead = manifestFeeds.filter(f =>
            running.get(f.cfg.dataset).exists(!_.isActive))
          dead.foreach(f => health.put(f.cfg.dataset, false))
          // post-mortem publish: surfaces the failure-state counters even
          // though the failed batch's own onBatchSuccess never ran
          publisher.publishNow()
          Thread.sleep(sys.env.getOrElse("GRAFT_RESTART_BACKOFF_MS", "60000").toLong)
          dead.foreach(startFeed)
        }
      case None =>
        loop(spark, store, fetcher, metrics, new graft.core.TextFileMetricsSink(
            sys.env.getOrElse("GRAFT_METRICS_FILE", "/tmp/graft_metrics.prom")),
          manifestFeeds, fixedFeeds, iterations = Int.MaxValue)
    }
    finally { endpoint.stop(); spark.stop() }
  }
}
