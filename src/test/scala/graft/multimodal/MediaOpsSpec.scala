package graft.multimodal

import java.nio.file.Files

import graft.SparkSpec
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

class MediaOpsSpec extends SparkSpec {
  import spark.implicits._

  private def raw = spark.createDataset(Seq(
    (1L, "image", Array.fill[Byte](256)(7)),
    (2L, "image", Array.tabulate[Byte](512)(_.toByte)),
    (3L, "video", Array.tabulate[Byte](1024)(i => (i * 3).toByte))))

  test("q183: codec frame slices recover the 256-byte pool chunks; dedup accounting closes") {
    // operator level: a 1024-byte unknown-kind payload slices into the
    // four exact quarters (the property q183's oracle relies on)
    val content = Array.tabulate[Byte](1024)(i => (i % 97).toByte)
    val one = spark.createDataset(Seq((9L, "video", content)))
    val fr = MediaOps.sampleFrames(MediaOps.decode(one), 4)
      .collect().sortBy(_.frameIdx)
    assert(fr.length == 4)
    fr.foreach { f =>
      assert(f.content.toSeq == content.slice(f.frameIdx * 256, f.frameIdx * 256 + 256).toSeq,
        s"frame ${f.frameIdx} is not the exact quarter")
    }
    // query level: distinct frames = the doc pool that actually joined;
    // every complete block of 4 shares all its frames (4x reuse)
    val row = graft.queries.PipelineQueries.q183(spark, sf0001)
      .select("n_videos", "n_frames", "n_distinct_frames", "saved_ppm")
      .as[(Long, Long, Long, Long)].head()
    val docs = graft.core.Tables.load(spark, sf0001, "documents")
    assert(row._1 == docs.count(), "every doc yields a video")
    // the pool itself contains duplicate chunks (near-dup docs share
    // their first 256 chars) — the codec path must find EXACTLY the
    // pool's distinct chunk count, no more, no less
    val poolDistinct = docs.select(rpad(col("text"), 256, " ")).distinct().count()
    assert(row._3 == poolDistinct,
      s"distinct frames ${row._3} must equal the pool's distinct chunks $poolDistinct")
    assert(row._4 == 1000000L * (row._2 - row._3) / row._2, "saved_ppm must be the exact floor")
    assert(row._4 >= 700000L, s"the 4-block rotation must give ~4x frame reuse, got ${row._4} ppm")
  }

  test("decode attaches deterministic typed metadata") {
    val m = MediaOps.decode(raw).collect().sortBy(_.mediaId)
    assert(m.length == 3)
    assert(m.forall(r => r.meta.width >= 16 && r.meta.height >= 16))
    // determinism: same payload → same metadata
    val again = MediaOps.decode(raw).collect().sortBy(_.mediaId)
    assert(m.map(_.meta).toSeq == again.map(_.meta).toSeq)
  }

  test("resize rewrites payload and metadata") {
    val r = MediaOps.resize(MediaOps.decode(raw), 64, 32).collect()
    assert(r.forall(m => m.meta.width == 64 && m.meta.height == 32))
    assert(r.forall(_.content.length == 16))
  }

  test("extractFeatures yields fixed-width vectors usable by VectorOps") {
    val f = MediaOps.extractFeatures(MediaOps.decode(raw), dim = 64)
    val rows = f.collect()
    assert(rows.forall(_.feature.length == 64))
    assert(rows.forall(_.feature.forall(v => v >= -1.0f && v <= 1.0f)))
    // plumbing: the features join into the vector similarity path
    val df = f.toDF().select(col("mediaId").as("vec_id"),
      col("feature").cast("array<double>").as("embedding"))
    val knn = VectorOps.knnBruteForce(df, "vec_id", "embedding", 1L, 2)
    assert(knn.count() == 2)
  }

  test("sampleFrames emits n frames per row without shuffling") {
    val media = MediaOps.decode(raw)
    val frames = MediaOps.sampleFrames(media, 4)
    assert(frames.count() == 12)
    val byId = frames.collect().groupBy(_.mediaId)
    assert(byId.keySet == Set(1L, 2L, 3L))
    assert(byId.values.forall(_.map(_.frameIdx).sorted.toSeq == Seq(0, 1, 2, 3)))
    // no exchange in the plan: mapPartitions preserves partitioning
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("feature pipeline feeds embedding near-dup: identical payloads pair at sim 1.0") {
    val payloadA = Array.tabulate[Byte](300)(i => (i * 7).toByte)
    val payloadB = Array.tabulate[Byte](300)(i => (i * 11 + 3).toByte)
    val media = spark.createDataset(Seq(
      (10L, "image", payloadA),
      (11L, "image", payloadA), // exact duplicate payload
      (12L, "image", payloadB)))
    val feats = MediaOps.extractFeatures(MediaOps.decode(media), dim = 32)
      .toDF().select(col("mediaId").as("vec_id"),
        col("feature").cast("array<double>").as("v"))
    val pairs = graft.plans.CosineSelfJoin.pairs(feats, "vec_id", "v", 0.999)
      .as[(Long, Long, Double)].collect()
    assert(pairs.toSeq == Seq((10L, 11L, 1.0))) // only the true duplicate pair
  }

  test("readBinaryDir loads payloads with metadata columns") {
    val dir = Files.createTempDirectory("graft_media").toFile
    Files.write(new java.io.File(dir, "a.bin").toPath, Array[Byte](1, 2, 3))
    Files.write(new java.io.File(dir, "b.bin").toPath, Array[Byte](4, 5))
    val df = MediaOps.readBinaryDir(spark, dir.getAbsolutePath, "*.bin")
    assert(df.columns.toSeq == Seq("path", "content", "length", "mod_time"))
    assert(df.count() == 2)
    assert(df.select(sum(col("length"))).as[Long].head() == 5L)
  }
}
