package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q101's content-defined chunking must be SHIFT-ROBUST — the property
  * that justifies it over fixed chunking: prepending text to a document
  * only reframes the chunks before the first post-insertion boundary,
  * and every chunk after it re-aligns bit-for-bit, so the edited
  * document still dedups heavily against the original. Fixed-width
  * chunks would re-key everything after the insertion point.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def runOn(docs: Seq[(Long, String)]) = {
    val dir = Files.createTempDirectory("cdc_docs").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    PipelineQueries.q101(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
  }

  // deterministic "prose" with enough entropy for boundaries to land
  private def prose(seed: Int, words: Int): String = {
    val rnd = new scala.util.Random(seed)
    (0 until words).map(_ => {
      val len = 3 + rnd.nextInt(8)
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }).mkString(" ")
  }

  test("a prepended insertion leaves most chunks shared (shift robustness)") {
    val base = prose(42, 400)
    val edited = "freshly inserted preamble text " + base
    val got = runOn(Seq(1L -> base, 2L -> edited))
    val (n1, dup1, ratio1) = got(1L)
    val (n2, dup2, ratio2) = got(2L)
    assert(n1 > 50, s"degenerate chunking: only $n1 chunks for ~2.6k chars")
    // every chunk of the ORIGINAL after the first boundary re-appears
    // in the edited doc, so both sides' dup ratios must be high
    assert(ratio1 > 0.9, s"original shares only $ratio1 of its chunks ($dup1/$n1)")
    assert(ratio2 > 0.85, s"edited doc shares only $ratio2 of its chunks ($dup2/$n2)")
  }

  test("unrelated documents share (almost) no chunks") {
    // the noise floor is chance collisions of the occasional 1-5 char
    // chunk (production CDC imposes a min chunk size to kill these);
    // the signal gap vs the ~0.9 shift-robustness ratio stays ~10x
    val got = runOn(Seq(1L -> prose(7, 400), 2L -> prose(8, 400)))
    assert(got(1L)._3 < 0.12 && got(2L)._3 < 0.12,
      s"unrelated docs report chunk sharing: ${got(1L)} / ${got(2L)}")
  }

  test("native CdcChunkHashes equals the declarative HOF chunker bit-for-bit") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(99)
    val docs = (0 until 60).map { i =>
      val len = rnd.nextInt(300)
      val s = (0 until len).map { _ =>
        rnd.nextInt(5) match {
          case 0 => ' '
          case 1 => ('0' + rnd.nextInt(10)).toChar
          case _ => ('a' + rnd.nextInt(26)).toChar
        }
      }.mkString
      // a few multi-byte rows exercise the non-ASCII fallback
      (i.toLong, if (i % 7 == 0) "déjà vu Ω " + s else s)
    }
    val both = docs.toDF("doc_id", "text").filter(length(col("text")) > 0)
      .select(
        graft.functions.TextOps.cdcChunkHashes(col("text"), 8).as("fast"),
        PipelineQueries.cdcChunkHashesHof(col("text"), 8).as("ref"))
      .as[(Seq[String], Seq[String])].collect()
    assert(both.nonEmpty && both.forall(r => r._1 == r._2),
      "native chunker diverges from the declarative form")
  }

  test("short documents below the window form a single whole-text chunk") {
    val got = runOn(Seq(1L -> "tiny", 2L -> "tiny", 3L -> "other"))
    assert(got(1L) == ((1L, 1L, 1.0)), s"got ${got(1L)}")
    assert(got(3L) == ((1L, 0L, 0.0)), s"got ${got(3L)}")
  }
}
