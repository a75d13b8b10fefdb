package graft.plans

import scala.util.matching.Regex

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Metrics
import graft.operators.{ManifestParser, Watermark}
import graft.sources.{Naming, Store}

/** Blob fetcher: executors call this inside `mapPartitions`, so the fetch
  * fans out one task per partition of the work-item set (the reference
  * fetches sequentially in one goroutine — downloader.go:59-103; the
  * Spark design parallelizes the per-file loop while keeping per-file
  * retry/permanence semantics in the closure).
  */
trait Fetcher extends Serializable {
  /** Returns the payload, or throws (transient errors are retried by the
    * task; [[graft.sources.PermanentError]] aborts). */
  def fetch(url: String): Array[Byte]

  /** Fetch straight into the store, returning (bytes, md5-hex). The
    * default buffers via [[fetch]]; streaming implementations (e.g.
    * [[graft.sources.HttpFetcher]]) override so payload bytes flow
    * source → digest → store without full materialization in the task —
    * the reference's `io.Copy` semantics (download/common.go:106). */
  def fetchTo(url: String, store: Store, name: String): (Long, String) = {
    val bytes = fetch(url)
    store.write(name, bytes)
    (bytes.length.toLong, Store.md5Hex(bytes))
  }
}

/** Static per-source plan descriptor — the reference's `config` struct
  * (/root/reference/download/common.go:28-41) as an immutable case class
  * (no package-level mutable flags).
  */
case class SourceConfig(
  dataset: String,
  pathPrefix: String,
  currentName: String,
  filePrefix: String = "",
  urlRegex: Option[Regex] = None,
  fixedFilename: Option[String] = None,
  dedupScopeRegex: Regex = new Regex("(.*)"),
  // per-file retry policy (reference: 1 min doubling to 8 min,
  // common.go:21-22); tests inject zero waits
  retryInitialMs: Long = 60000L,
  retryMaxMs: Long = 480000L)

/** Result of one pipeline run. `newWatermark` follows the gated-advance
  * rule; `kept`/`duplicates` partition the successfully fetched files by
  * the dedup verdict.
  */
case class IngestReport(
  newWatermark: Long,
  kept: Seq[String],
  duplicates: Seq[String],
  failed: Seq[Long],
  currentPromoted: Seq[String])

/** The reference's E2/E3 pipeline re-expressed as Spark dataflow
  * (SURVEY §3): manifest scan → regex projection → watermark filter →
  * distributed fetch → content-hash dedup (anti-join against the scope
  * catalog) → partitioned archive write → current-pointer promotion →
  * gated watermark advance.
  *
  * Data-movement design: the manifest is tiny and parses driver-side;
  * the *fetches* are the heavy fan-out and run as executor tasks; dedup
  * is a broadcast anti-join of the new batch against the scope catalog
  * (both metadata-only: name + md5); payload bytes never pass through a
  * shuffle.
  */
object ArchivePipeline {

  /** One run of a fixed-name source (the MaxMind pipeline, E2 of SURVEY
    * §3): single URL, UTC date directory + timestamp file prefix, scope
    * dedup, current-pointer promotion. Driver-side by design — one
    * object per iteration has no fan-out to distribute; the manifest
    * path ([[run]]) is where executor parallelism pays.
    */
  def runFixedSource(cfg: SourceConfig, url: String, store: Store,
                     fetcher: Fetcher, now: java.time.Instant,
                     sleep: scala.concurrent.duration.FiniteDuration => Unit =
                       d => Thread.sleep(d.toMillis)): Either[Throwable, IngestReport] = {
    import scala.concurrent.duration._
    val name = Naming.fixedName(
      cfg.pathPrefix + Naming.datePrefix(now),
      Naming.timestampPrefix(now),
      cfg.fixedFilename.getOrElse(
        return Left(new IllegalArgumentException("fixedFilename required"))))
    graft.sources.Retry.withRetry(
        cfg.retryInitialMs.millis, cfg.retryMaxMs.millis, sleep) {
      val (_, md5) = fetcher.fetchTo(url, store, name)
      val scope = cfg.dedupScopeRegex.findFirstMatchIn(name).map(_.group(1)).getOrElse("")
      val isDup = store.list(scope).exists(o => o.name != name && o.md5.contains(md5))
      if (isDup) {
        store.delete(name) // delete failure throws PermanentError → aborts
        IngestReport(0L, Nil, Seq(name), Nil, Nil)
      } else {
        store.copy(name, cfg.currentName)
        IngestReport(0L, Seq(name), Nil, Nil, Seq(cfg.currentName))
      }
    }
  }

  /** One incremental run over a routeviews-style manifest feed. */
  def run(spark: SparkSession,
          manifestBody: String,
          manifestUrl: String,
          cfg: SourceConfig,
          store: Store,
          watermark: Long,
          fetcher: Fetcher,
          metrics: Metrics): IngestReport = {
    import spark.implicits._

    // 1. Manifest scan + projection + watermark filter (O3-O6, O8).
    val entries = ManifestParser.parseText(spark, manifestBody)
    val fresh = Watermark.filterNew(entries.toDF(), col("seqnum"), watermark)
      .as[(Int, Long, String)].collect()
      .map { case (seq, _, path) =>
        (seq.toLong, ManifestParser.absoluteUrl(manifestUrl, path))
      }
    if (fresh.isEmpty)
      return IngestReport(watermark, Nil, Nil, Nil, Nil)
    val rep = ingest(spark, fresh.toSeq, cfg, store, fetcher, metrics)
    rep.copy(newWatermark = math.max(watermark, rep.newWatermark))
  }

  /** Fetch → dedup → promote → gated advance for an ALREADY
    * watermark-filtered batch of `(seqnum, absoluteUrl)` work items —
    * the tail of [[run]], exposed so the STREAMING daemon can call it
    * per micro-batch (the `graft-manifest` source's checkpointed offset
    * has already done the filtering there). `newWatermark` is the gated
    * advance over THIS batch only; [[run]] maxes it with the incoming
    * watermark.
    */
  def ingest(spark: SparkSession,
             fresh: Seq[(Long, String)],
             cfg: SourceConfig,
             store: Store,
             fetcher: Fetcher,
             metrics: Metrics): IngestReport = {
    import spark.implicits._
    if (fresh.isEmpty) return IngestReport(0L, Nil, Nil, Nil, Nil)

    // 2. Distributed fetch + store write (O9-O10). Each task fetches,
    // derives the archive key, writes, and emits metadata only.
    val errLabel = cfg.dataset
    val failedAcc = metrics.downloadFailed(errLabel)
    val items = spark.createDataset(fresh).toDF("seqnum", "url")
    // ONE action drains the fetch stage: the side-effecting work
    // (fetch + store write + failure counters) must not sit under a
    // cached plan that later actions can silently recompute. The
    // collected rows are metadata only (seqnum, name, md5, failed) and
    // re-enter the relational dedup as a LocalRelation.
    val fetchedRows = items.repartition(math.min(fresh.length, 32))
      .mapPartitions { rows =>
        rows.map { r =>
          val seq = r.getLong(0); val url = r.getString(1)
          val name = cfg.fixedFilename match {
            case Some(fix) => Naming.fixedName(cfg.pathPrefix, cfg.filePrefix, fix)
            case None => Naming.regexName(cfg.pathPrefix, cfg.filePrefix,
              cfg.urlRegex.getOrElse(new Regex("(.*/)([^/]+)$")), url)
              .getOrElse(cfg.pathPrefix + url.substring(url.lastIndexOf('/') + 1))
          }
          // Per-file retry with the reference's backoff taxonomy runs
          // INSIDE the task (transient network errors don't fail the
          // task; PermanentError aborts immediately) — Spark task
          // retries remain the outer safety net.
          graft.sources.Retry.withRetry(
            scala.concurrent.duration.Duration(cfg.retryInitialMs, "ms"),
            scala.concurrent.duration.Duration(cfg.retryMaxMs, "ms")) {
            // streamed when the fetcher supports it: payload bytes flow
            // source → digest → store inside the task, never buffered
            val (_, md5) = fetcher.fetchTo(url, store, name)
            (seq, name, md5, false)
          } match {
            case Right(row) => row
            case Left(e) =>
              failedAcc.add(1)
              (seq, s"<failed:${e.getMessage}>", "", true)
          }
        }
      }.collect()
    val fetched = spark.createDataset(fetchedRows.toSeq)
      .toDF("seqnum", "name", "md5", "failed")

    // 3. Dedup verdict (O11-O13): a file is a duplicate iff another name
    // in its scope shares its md5. The reference checks sequentially at
    // upload time (first of an identical pair wins, common.go:162-190);
    // batch-equivalent: keep-first per (scope, md5) within the batch,
    // then broadcast anti-join against the PRE-existing scope catalog
    // (metadata only — payload bytes never shuffle).
    val ok = fetched.filter(!col("failed"))
      .withColumn("scope", regexp_extract(col("name"), cfg.dedupScopeRegex.regex, 1))
    val batchNames = ok.select("name").as[String].collect().toSet
    val scopes = ok.select("scope").distinct().as[String].collect()
    val preExisting = scopes.flatMap(store.list).distinct
      .filterNot(o => batchNames.contains(o.name))
    // Scope equality is part of the duplicate predicate: the reference's
    // IsFileNew (common.go:162-190) only ever compares within the scope
    // prefix it listed, so bytes shared with an object in a DIFFERENT
    // scope (e.g. an unchanged file across a month boundary under
    // month-scoped dedup) must be kept, not deleted.
    val catDf = broadcast(spark.createDataset(preExisting.toSeq).toDF()
      .select(col("name").as("cat_name"), col("md5").as("cat_md5"))
      .withColumn("cat_scope",
        regexp_extract(col("cat_name"), cfg.dedupScopeRegex.regex, 1)))
    val w = Window.partitionBy(col("scope"), col("md5")).orderBy(col("seqnum"))
    val keptRows = ok
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
      .join(catDf,
        col("md5") === col("cat_md5") && col("name") =!= col("cat_name") &&
          col("scope") === col("cat_scope"),
        "left_anti")
      .select("seqnum", "name").as[(Long, String)].collect()

    val kept = keptRows.map(_._2).toSeq
    val keptSet = kept.toSet // Set membership: filterNot over a Seq is O(k²)
    val dups = batchNames.toSeq.sorted.filterNot(keptSet.contains)

    // 4. Duplicate deletion (O14) — reference deletes the just-uploaded
    // duplicate; delete failure is permanent (common.go:123-130).
    dups.foreach(store.delete)

    // 5. Current-pointer promotion (O15): latest kept file by archive key
    // order is copied to the canonical current name.
    val promoted = kept.sorted.lastOption.map { newest =>
      store.copy(newest, cfg.currentName)
      cfg.currentName
    }.toSeq

    // 6. Gated watermark advance (O7).
    val adv = Watermark.gatedAdvance(fetched, Nil, col("seqnum"), col("failed"))
      .select("watermark").as[Long].head()
    val failedSeqs = fetchedRows.filter(_._4).map(_._1)

    IngestReport(adv, kept, dups, failedSeqs.toSeq, promoted)
  }
}
