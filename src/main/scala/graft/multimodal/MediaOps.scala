package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata for an opaque media payload. */
case class MediaMeta(format: String, width: Int, height: Int, durationMs: Long)

/** A media row: payloads are opaque `BINARY` columns + typed metadata —
  * the multimodal-column model for a training-data pipeline. Content
  * stays columnar in parquet, never passes through a shuffle unless the
  * operator genuinely needs the bytes.
  */
case class MediaRow(mediaId: Long, kind: String, content: Array[Byte], meta: MediaMeta)

/** A sampled frame emitted by [[MediaOps.sampleFrames]]. */
case class Frame(mediaId: Long, frameIdx: Int, content: Array[Byte])

/** A fixed-width feature vector emitted by [[MediaOps.extractFeatures]]. */
case class MediaFeature(mediaId: Long, kind: String, feature: Array[Float])

/** Multimodal column operators: decode, feature-extract, resize,
  * frame-sample, all as `mapPartitions` over typed Datasets so each task
  * processes its partition's payloads in one pass (the Scala analog of
  * Pandas-UDF batching: one iterator per partition, no per-row UDF
  * dispatch, payload bytes stay inside the task).
  *
  * === CODEC NOTICE ===
  * Image and uncompressed-audio payloads run through REAL kernels with
  * NO external library: BMP (24-bpp) and WAV (PCM16) by plain
  * byte-layout parsing ([[RawCodec]]), compressed images
  * (png/jpeg/gif/tiff) via the JDK's `javax.imageio`
  * ([[ImageIoCodec]]: header-only dimension probe, nearest-neighbor
  * resize re-encoded in the source format, pooled-gray features).
  * Compressed AUDIO: the mp3 PROBE is real ([[RawCodec.probeMp3]] —
  * frame-sync parse, bitrate/samplerate tables, CBR duration estimate);
  * full mp3 decode has no JDK codec, so feature/frames fall back to the
  * clearly-isolated deterministic fakes in [[StubCodec]] — as does any
  * payload whose real decode fails. [[Codec]] dispatches by sniffing
  * payload bytes; swapping in further codecs means extending that
  * dispatch only.
  */
object MediaOps {

  /** Sniff-and-dispatch: real kernels where the format permits,
    * deterministic stubs otherwise. The real kernels are TOTAL at this
    * boundary: a payload that sniffs as bmp/wav but is malformed,
    * truncated, or an unsupported variant (32-bpp BMP, float WAV, lying
    * headers) falls back to the stub instead of throwing — one corrupt
    * file in a corpus must never abort a whole decode/feature job (the
    * reference's drop-with-metric philosophy applied to payloads). */
  object Codec {
    private def total[A](real: => A)(stub: => A): A =
      try real catch { case scala.util.control.NonFatal(_) => stub }

    def probe(content: Array[Byte]): MediaMeta = RawCodec.sniff(content) match {
      case Some("bmp") => total(RawCodec.probeBmp(content))(StubCodec.probe(content))
      case Some("wav") => total(RawCodec.probeWav(content))(StubCodec.probe(content))
      case Some("mp3") => total(RawCodec.probeMp3(content))(StubCodec.probe(content))
      case _ => ImageIoCodec.sniff(content) match {
        case Some(fmt) => total(ImageIoCodec.probe(content, fmt))(StubCodec.probe(content))
        case _ => StubCodec.probe(content)
      }
    }

    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] =
      RawCodec.sniff(content) match {
        case Some("bmp") =>
          total(RawCodec.resizeBmp(content, w, h))(StubCodec.resize(content, w, h))
        case _ => ImageIoCodec.sniff(content) match {
          case Some(fmt) =>
            total(ImageIoCodec.resize(content, fmt, w, h))(StubCodec.resize(content, w, h))
          case _ => StubCodec.resize(content, w, h) // resize of audio = stub too
        }
      }

    def feature(content: Array[Byte], dim: Int): Array[Float] =
      RawCodec.sniff(content) match {
        case Some("bmp") =>
          total(RawCodec.bmpFeature(content, dim))(StubCodec.feature(content, dim))
        case Some("wav") =>
          total(RawCodec.wavFeature(content, dim))(StubCodec.feature(content, dim))
        case _ => ImageIoCodec.sniff(content) match {
          case Some(_) =>
            total(ImageIoCodec.feature(content, dim))(StubCodec.feature(content, dim))
          case _ => StubCodec.feature(content, dim)
        }
      }

    def frames(content: Array[Byte], n: Int): Seq[Array[Byte]] =
      RawCodec.sniff(content) match {
        case Some("wav") =>
          total(RawCodec.wavFrames(content, n))(StubCodec.frames(content, n))
        case _ => StubCodec.frames(content, n)
      }
  }

  /** Deterministic fake codec kernels, clearly isolated. */
  object StubCodec {
    /** "Decode" a header: fake dims derived from the first payload bytes. */
    def probe(content: Array[Byte]): MediaMeta = {
      val d = digest(content)
      MediaMeta(
        format = if ((d(0) & 1) == 0) "png" else "jpeg",
        width = 16 + (d(1) & 0x7f),
        height = 16 + (d(2) & 0x7f),
        durationMs = ((d(3) & 0xff).toLong + 1) * 1000L)
    }

    /** "Resize": deterministic payload derived from (content, w, h). */
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] =
      digest(content ++ s"|$w|$h".getBytes("UTF-8")).take(16)

    /** "Feature": fixed-width float vector from payload bytes. */
    def feature(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var seedBlock = digest(content)
      var i = 0
      while (i < dim) {
        if (i % seedBlock.length == 0 && i > 0) seedBlock = digest(seedBlock)
        out(i) = ((seedBlock(i % seedBlock.length) & 0xff) - 128) / 128.0f
        i += 1
      }
      out
    }

    /** "Frame sample": split payload into n deterministic chunks. */
    def frames(content: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val step = math.max(1, content.length / math.max(n, 1))
      (0 until n).map(i => content.slice(i * step, i * step + step))
    }

    private def digest(bytes: Array[Byte]): Array[Byte] =
      MessageDigest.getInstance("MD5").digest(bytes)
  }

  /** Attach decoded metadata to raw payloads — one codec probe per row,
    * batched per partition. */
  def decode(raw: Dataset[(Long, String, Array[Byte])]): Dataset[MediaRow] = {
    import raw.sparkSession.implicits._
    raw.mapPartitions(_.map { case (id, kind, content) =>
      MediaRow(id, kind, content, Codec.probe(content))
    })
  }

  /** Resize every payload to (w, h); metadata updated to match. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      m.copy(content = Codec.resize(m.content, w, h),
        meta = m.meta.copy(width = w, height = h))
    })
  }

  /** Fixed-width feature vectors (the input to VectorOps similarity /
    * dedup); `dim` matches the embeddings table layout. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m =>
      MediaFeature(m.mediaId, m.kind, Codec.feature(m.content, dim))))
  }

  /** Sample n frames per video payload — a one-to-many flatMap; output
    * rows inherit the input partitioning (no shuffle). */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(m =>
      Codec.frames(m.content, n).zipWithIndex.map {
        case (bytes, i) => Frame(m.mediaId, i, bytes)
      }))
  }

  /** Read a directory of media files as (path, content, length, modTime)
    * via Spark's binaryFile source — the production entry for payloads
    * staged on a shared filesystem. */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("content"), col("length"),
        col("modificationTime").as("mod_time"))
}
