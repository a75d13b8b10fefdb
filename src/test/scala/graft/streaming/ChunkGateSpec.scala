package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q114's continuous twin: the at-ingest chunk-duplication gate over
  * the stored (doc_id, h) pair relation. Contract: a whole-corpus
  * batch reproduces batch q114 row for row; a crash-replayed batch
  * appends nothing and re-emits identical verdicts; across batches the
  * gate is first-arrival-wins (a later duplicate drops, the stored
  * original's past verdict stands).
  */
class ChunkGateSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_chunk").toString

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("doc_id", "n_chunks", "n_dup_chunks", "dup_ratio", "verdict")
    .as[(Long, Long, Long, Double, String)].collect().sortBy(_._1).toSeq

  // 16 tokens = exactly two 8-token chunks
  private def doc(id: Long, a: String, b: String) =
    (id, (Seq.fill(8)(a) ++ Seq.fill(8)(b)).mkString(" "))

  test("one whole-corpus batch reproduces batch q114 row for row") {
    val chDir = tmp() + "/ch"
    val docs = graft.core.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text")
    val streamed = rows(CorpusIngest.chunkBatch(docs, chDir))
    val batch = rows(graft.queries.AuditQueries.q114(spark, sf0001))
    assert(streamed == batch,
      s"gate diverges from batch q114 (first diff: ${
        streamed.zip(batch).find(p => p._1 != p._2)})")
  }

  test("a crash-replayed batch appends nothing and re-emits identical verdicts") {
    val chDir = tmp() + "/ch"
    val b1 = Seq(doc(1, "alpha", "beta"), doc(2, "gamma", "delta"))
      .toDF("doc_id", "text")
    val first = rows(CorpusIngest.chunkBatch(b1, chDir))
    val storeAfter1 = spark.read.parquet(chDir).count()
    val replayed = rows(CorpusIngest.chunkBatch(b1, chDir))
    assert(first == replayed, s"replay changed verdicts: $first vs $replayed")
    assert(spark.read.parquet(chDir).count() == storeAfter1,
      "replay must append nothing (doc-granular anti-join)")
    assert(first.forall(_._5 == "keep"), s"distinct docs must keep: $first")
  }

  test("a later duplicate drops against the stored original (first-arrival-wins)") {
    val chDir = tmp() + "/ch"
    val b1 = Seq(doc(1, "alpha", "beta")).toDF("doc_id", "text")
    assert(rows(CorpusIngest.chunkBatch(b1, chDir)).head._5 == "keep")
    // doc 2 shares BOTH chunks with stored doc 1 → 2/2 duplicated → drop;
    // doc 3 shares one of two (alpha-chunk) → ratio 0.5, NOT > ½ → keep
    val b2 = Seq(doc(2, "alpha", "beta"), doc(3, "alpha", "omega"))
      .toDF("doc_id", "text")
    val got = rows(CorpusIngest.chunkBatch(b2, chDir)).map(r => r._1 -> r).toMap
    assert(got(2L)._5 == "drop" && got(2L)._4 == 1.0, s"full dup must drop: $got")
    assert(got(3L)._5 == "keep" && got(3L)._4 == 0.5, s"half dup must keep: $got")
  }

  test("within-batch duplicates drop symmetrically, as in batch q114") {
    val chDir = tmp() + "/ch"
    val b = Seq(doc(5, "one", "two"), doc(6, "one", "two"))
      .toDF("doc_id", "text")
    val got = rows(CorpusIngest.chunkBatch(b, chDir))
    assert(got.forall(_._5 == "drop"),
      s"same-batch duplicates are symmetric (no earlier arrival): $got")
  }
}
