package graft.sources.manifest

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The manifest feed as a DSv2 source: batch read, and the streaming
  * form whose checkpointed seqnum offset replaces the reference's
  * process-local watermark — a restart resumes exactly past the last
  * processed sequence number.
  */
class ManifestSourceSpec extends SparkSpec {

  private def writeManifest(path: String, rows: (Int, String)*): Unit =
    Files.write(Paths.get(path),
      ("# comment line\nbad row\n" + rows.map { case (s, f) =>
        s"$s\t1497717708\t$f"
      }.mkString("\n") + "\n").getBytes(UTF_8))

  test("batch read parses rows, drops comments/bad lines, resolves urls") {
    val f = Files.createTempDirectory("graft_mansrc").resolve("m.log").toString
    writeManifest(f, 3363 -> "2017/06/a.gz", 3364 -> "2017/06/b.gz")
    val df = spark.read.format("graft-manifest").option("url", f).load()
    assert(df.schema.fieldNames.toSeq == Seq("seqnum", "ts", "path", "url"))
    val rows = df.orderBy("seqnum").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(3363L, 3364L))
    assert(rows.head.getString(3).endsWith("/2017/06/a.gz"))
    assert(rows.head.getTimestamp(1).toInstant.getEpochSecond == 1497717708L)
  }

  test("streaming: checkpointed seqnum offset resumes across restarts") {
    val dir = Files.createTempDirectory("graft_mansrc_stream")
    val manifest = dir.resolve("m.log").toString
    val ckpt = dir.resolve("ckpt").toString
    val out = dir.resolve("out").toString
    writeManifest(manifest, 3363 -> "2017/06/a.gz", 3364 -> "2017/06/b.gz")

    // a durable (recoverable) sink: the memory sink can't resume from a
    // checkpoint, parquet append can
    def drain(): Unit = {
      val q = spark.readStream.format("graft-manifest").option("url", manifest).load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    drain()
    assert(spark.read.parquet(out).select("seqnum")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(3363L, 3364L))

    // feed grows; a RESTARTED stream with the same checkpoint emits only
    // the new row — the reference's watermark filter, engine-managed
    writeManifest(manifest,
      3363 -> "2017/06/a.gz", 3364 -> "2017/06/b.gz", 3365 -> "2017/06/c.gz")
    drain()
    assert(spark.read.parquet(out).select("seqnum")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(3363L, 3364L, 3365L))
  }

  test("a transiently-empty feed cannot regress the offset and replay history") {
    val dir = Files.createTempDirectory("graft_mansrc_empty")
    val manifest = dir.resolve("m.log").toString
    val ckpt = dir.resolve("ckpt").toString
    val out = dir.resolve("out").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-manifest").option("url", manifest).load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    writeManifest(manifest, 10 -> "x/a.gz", 11 -> "x/b.gz")
    drain()
    // feed transiently serves an empty body
    Files.write(Paths.get(manifest), Array.emptyByteArray)
    drain()
    // feed recovers with one NEW row: only it may appear — the two
    // historical rows must not replay
    writeManifest(manifest, 10 -> "x/a.gz", 11 -> "x/b.gz", 12 -> "x/c.gz")
    drain()
    assert(spark.read.parquet(out).select("seqnum")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(10L, 11L, 12L))
  }

  test("options are case-insensitive (URL works like url)") {
    val f = Files.createTempDirectory("graft_mansrc_ci").resolve("m.log").toString
    writeManifest(f, 5 -> "z/a.gz")
    assert(spark.read.format("graft-manifest").option("URL", f).load().count() == 1)
  }

  test("streaming composes with watermark-style filters and dedup downstream") {
    val dir = Files.createTempDirectory("graft_mansrc_c")
    val manifest = dir.resolve("m.log").toString
    writeManifest(manifest, 1 -> "x/a.gz", 2 -> "x/b.gz", 3 -> "y/c.gz")
    val q = spark.readStream.format("graft-manifest").option("url", manifest).load()
      .filter(col("path").startsWith("x/"))
      .writeStream.format("memory").queryName("manifest_filtered")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table("manifest_filtered").count() == 2)
  }
}
