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
  * === STUB NOTICE ===
  * Real image/audio codecs are not available in this environment, so the
  * *codec kernels* ([[StubCodec]]) are deterministic fakes — each is a
  * pure function of the payload bytes. The Spark-side plumbing — schemas,
  * typed Datasets, partition-batched execution, shuffle-free layout — is
  * real and is what these operators test. Swapping in a real codec means
  * replacing [[StubCodec]] only.
  */
object MediaOps {

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
      MediaRow(id, kind, content, StubCodec.probe(content))
    })
  }

  /** Resize every payload to (w, h); metadata updated to match. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      m.copy(content = StubCodec.resize(m.content, w, h),
        meta = m.meta.copy(width = w, height = h))
    })
  }

  /** Fixed-width feature vectors (the input to VectorOps similarity /
    * dedup); `dim` matches the embeddings table layout. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m =>
      MediaFeature(m.mediaId, m.kind, StubCodec.feature(m.content, dim))))
  }

  /** Sample n frames per video payload — a one-to-many flatMap; output
    * rows inherit the input partitioning (no shuffle). */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(m =>
      StubCodec.frames(m.content, n).zipWithIndex.map {
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
