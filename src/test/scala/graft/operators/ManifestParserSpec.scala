package graft.operators

import graft.SparkSpec

import scala.io.Source

/** Golden-fixture parse test mirroring the reference's manifest test
  * expectations (/root/reference/download/routeviews_test.go:104-230):
  * 30 data rows behind comment lines; watermark 0 → all, 3380 → the 12
  * rows 3381-3392, 4000 → none.
  */
class ManifestParserSpec extends SparkSpec {
  private lazy val body = {
    val src = Source.fromResource("pfx2as-creation.log")
    try src.mkString finally src.close()
  }

  test("parses 30 rows, drops comments") {
    val rows = ManifestParser.parseText(spark, body).collect()
    assert(rows.length == 30)
    assert(rows.map(_.seqnum).sorted.toSeq == (3363 to 3392))
    assert(rows.forall(_.path.endsWith(".pfx2as.gz")))
    assert(rows.forall(_.tsEpoch >= 1497717708L))
  }

  test("watermark filtering matches reference golden cases") {
    import org.apache.spark.sql.functions.col
    val parsed = ManifestParser.parseText(spark, body).toDF
    def after(wm: Long) =
      Watermark.filterNew(parsed, col("seqnum"), wm).collect().map(_.getInt(0)).sorted
    assert(after(0L).toSeq == (3363 to 3392))
    assert(after(3380L).toSeq == (3381 to 3392))
    assert(after(4000L).isEmpty)
  }

  test("malformed rows are dropped, not fatal") {
    val noisy = body + "\nnot a row\n9999999 12345 too-many-digits-seq\n"
    assert(ManifestParser.parseText(spark, noisy).count() == 30)
  }

  test("absoluteUrl joins manifest dir with relative path") {
    assert(ManifestParser.absoluteUrl(
      "http://data.example.org/routeviews/pfx2as-creation.log",
      "2017/06/file.pfx2as.gz")
      == "http://data.example.org/routeviews/2017/06/file.pfx2as.gz")
  }
}
