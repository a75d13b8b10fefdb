package graft.sources.manifest

import java.util


import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{ManifestEntry, ManifestParser}

/** DataSource V2 provider exposing a manifest feed as BOTH a batch
  * relation and a STREAMING source (`graft-manifest`): the reference's
  * incremental loop — fetch manifest, keep rows above the watermark,
  * advance the watermark (/root/reference/downloader.go:59-103,
  * routeviews.go:73-113) — re-expressed as Structured Streaming with
  * the sequence number as the CHECKPOINTED OFFSET. Each micro-batch
  * emits exactly the manifest rows in `(lastOffset, latestSeqnum]`;
  * Spark's checkpoint persists the offset, so restarts resume where
  * the stream stopped — the process-local watermark ints
  * (downloader.go:61-62) become engine-managed state.
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft-manifest")
  *   .option("url", "https://host/feed/pfx2as-creation.log").load()
  * }}}
  * `url` may be http(s) (fetched via [[graft.sources.HttpFetcher]]) or
  * a local filesystem path (tests / staged feeds). Schema:
  * (seqnum LONG, ts TIMESTAMP, path STRING, url STRING) — `url` is the
  * resolved absolute fetch URL (routeviews.go:109).
  *
  * Scale note: a manifest is metadata-sized by construction (the heavy
  * fan-out is the per-file FETCH, which downstream operators run from
  * these rows), so one input partition per batch is the right shape.
  */
class ManifestSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-manifest"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ManifestSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // DSv2 options are case-insensitive; properties arrives case-preserving
    val opts = new CaseInsensitiveStringMap(properties)
    new ManifestTable(Option(opts.get("url")).getOrElse(
      throw new IllegalArgumentException("graft-manifest requires option 'url'")))
  }
}

object ManifestSource {
  val Schema: StructType = StructType(Seq(
    StructField("seqnum", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("url", StringType, nullable = false)))

  /** Fetch + parse, driver-side (manifests are tiny). */
  private[manifest] def fetch(url: String): Seq[ManifestEntry] = {
    val body =
      if (url.startsWith("http://") || url.startsWith("https://"))
        graft.sources.HttpFetcher().fetchString(url)
      else
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(url)),
          java.nio.charset.StandardCharsets.UTF_8)
    ManifestParser.parseLines(body)
  }

  private[manifest] def toRow(url: String)(e: ManifestEntry): InternalRow =
    InternalRow(
      e.seqnum.toLong,
      e.tsEpoch * 1000000L, // TimestampType carries epoch micros
      UTF8String.fromString(e.path),
      UTF8String.fromString(ManifestParser.absoluteUrl(url, e.path)))
}

private class ManifestTable(url: String) extends Table with SupportsRead {
  override def name(): String = s"graft-manifest($url)"
  override def schema(): StructType = ManifestSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new ManifestScan(url)
}

private class ManifestScan(url: String) extends Scan {
  override def readSchema(): StructType = ManifestSource.Schema
  override def description(): String = s"graft-manifest url=$url"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      Array(ManifestPartition(ManifestSource.fetch(url).sortBy(_.seqnum)))
    override def createReaderFactory(): PartitionReaderFactory =
      new ManifestReaderFactory(url)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ManifestStream(url)
}

/** The watermark as a streaming offset: max seqnum seen. */
private case class SeqOffset(seq: Long) extends Offset {
  override def json: String = seq.toString
}

private class ManifestStream(url: String) extends MicroBatchStream
    with SupportsAdmissionControl {
  // entries from the most recent latestOffset fetch: each trigger
  // fetches the feed ONCE; planInputPartitions embeds the rows so
  // executors never re-fetch (a checkpoint REPLAY plans without a prior
  // latestOffset in this process and re-fetches then — recovery only).
  @volatile private var lastFetch: Seq[ManifestEntry] = null

  override def initialOffset(): Offset = SeqOffset(0L)

  // Admission-control form: the engine hands us the restored START
  // offset, and the reported latest is clamped to it — a transiently
  // empty/unreadable feed can therefore never regress the checkpoint
  // below what was already processed and replay history once the feed
  // recovers (the same invariant Downloader.loadWatermark defends
  // driver-side). The no-argument variant is unreachable once
  // SupportsAdmissionControl is implemented.
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the supported form")

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SeqOffset].seq
    val entries = ManifestSource.fetch(url)
    lastFetch = entries
    val m = if (entries.isEmpty) 0L else entries.map(_.seqnum.toLong).max
    SeqOffset(math.max(s, m))
  }

  override def reportLatestOffset(): Offset = null // engine tolerates absence

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].seq
    val e = end.asInstanceOf[SeqOffset].seq
    if (e <= s) Array.empty
    else {
      val entries = Option(lastFetch).getOrElse(ManifestSource.fetch(url))
      Array(ManifestPartition(
        entries.filter(x => x.seqnum > s && x.seqnum <= e).sortBy(_.seqnum)))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(url)

  override def deserializeOffset(json: String): Offset = SeqOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** The batch's rows, embedded (a manifest is metadata-sized by
  * construction, so the planned rows ship in the partition and the
  * executor never re-fetches the feed). Replays are driven by the
  * offset range at plan time; the feed is append-only by the
  * reference's own contract (seqnums grow monotonically,
  * routeviews.go:107-110). */
private case class ManifestPartition(rows: Seq[ManifestEntry]) extends InputPartition

private class ManifestReaderFactory(url: String) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ManifestPartition]
    new PartitionReader[InternalRow] {
      private val it = p.rows.iterator
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        current = ManifestSource.toRow(url)(it.next())
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
