package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming corpus builder: three dedup tiers per micro-batch (exact
  * in-batch, near-dup in-batch, exact+near-dup vs the stored corpus),
  * survivors' signatures appended and enforced across batches.
  */
class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_corpus").toString

  private val baseText =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private def variant(tail: String) =
    baseText + " " + tail // high-overlap near-dup of baseText
  private val distinctText =
    "one two three four five six seven eight nine ten eleven twelve"

  test("ingestBatch: exact, in-batch near-dup, and cross-batch near-dup all drop") {
    val sigDir = tmp() + "/sig"
    // batch 1: 1 and 2 are exact dups; 3 is a near-dup of 1; 4 distinct
    val b1 = Seq(
      (1L, baseText), (2L, baseText), (3L, variant("nu")), (4L, distinctText))
      .toDF("doc_id", "text")
    val kept1 = CorpusIngest.ingestBatch(b1, sigDir)
      .select("doc_id").as[Long].collect().sorted
    assert(kept1.toSeq == Seq(1L, 4L))
    // batch 2: 11 = exact dup of stored 1; 12 = near-dup of stored 1;
    // 13 genuinely new
    val b2 = Seq(
      (11L, baseText), (12L, variant("xi")),
      (13L, "completely different words with no overlap at all whatsoever here"))
      .toDF("doc_id", "text")
    val kept2 = CorpusIngest.ingestBatch(b2, sigDir)
      .select("doc_id").as[Long].collect().sorted
    assert(kept2.toSeq == Seq(13L))
    // the store accumulated exactly the three survivors
    val stored = spark.read.parquet(sigDir).select("doc_id").as[Long].collect().sorted
    assert(stored.toSeq == Seq(1L, 4L, 13L))
  }

  test("bucketed band table: same dedup decisions, zero band-key Exchange vs store") {
    val sigDir = tmp() + "/sig"
    val bt = Some("corpus_bands_spec")
    spark.sql("DROP TABLE IF EXISTS corpus_bands_spec")
    val b1 = Seq(
      (1L, baseText), (2L, baseText), (3L, variant("nu")), (4L, distinctText))
      .toDF("doc_id", "text")
    assert(CorpusIngest.ingestBatch(b1, sigDir, bandTableName = bt)
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    // steady state: the stored band table exists; decisions must match
    // the recompute-from-signatures path exactly
    val b2 = Seq(
      (11L, baseText), (12L, variant("xi")),
      (13L, "completely different words with no overlap at all whatsoever here"))
      .toDF("doc_id", "text")
    assert(CorpusIngest.ingestBatch(b2, sigDir, bandTableName = bt)
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(13L))
    // the band table tracks the signature store row-for-row (4 bands/doc)
    assert(spark.table("corpus_bands_spec").count() ==
      spark.read.parquet(sigDir).count() * 4)
    // plan shape: the candidate join against the stored buckets plans
    // with NO hash-partitioning Exchange on the band key — the batch
    // side broadcasts, the stored side reads its bucket layout
    val sig = graft.operators.MinHashLsh.signatures(b2, 8, 3)
    val plan = graft.operators.MinHashLsh.nearDupAgainstBands(
        sig, spark.table("corpus_bands_spec"), spark.read.parquet(sigDir),
        4, 2, 0.5)
      .queryExecution.executedPlan.toString
    val bkExchanges = plan.linesIterator.count(l =>
      l.contains("Exchange") && l.contains("hashpartitioning(bk"))
    assert(bkExchanges == 0, s"band-key Exchange in steady-state plan:\n$plan")
    spark.sql("DROP TABLE IF EXISTS corpus_bands_spec")
  }

  test("orphan band rows (crash between band append and sig append) are harmless") {
    val sigDir = tmp() + "/sig"
    val bt = Some("corpus_bands_orphan")
    spark.sql("DROP TABLE IF EXISTS corpus_bands_orphan")
    val b1 = Seq((1L, baseText), (4L, distinctText)).toDF("doc_id", "text")
    CorpusIngest.ingestBatch(b1, sigDir, bandTableName = bt)
    // simulate the crash window: band rows appended for a doc whose sig
    // row never landed (doc 99) — band appends run FIRST by design
    graft.operators.MinHashLsh.bandTable(
        graft.operators.MinHashLsh.signatures(
          Seq((99L, variant("omega"))).toDF("doc_id", "text"), 8, 3), 4, 2)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .bucketBy(32, "bk").sortBy("bk")
      .format("parquet").saveAsTable("corpus_bands_orphan")
    // the replayed/next batch still makes the right decisions: the
    // orphan can produce candidates but verify inner-joins storedSig,
    // where doc 99 does not exist — so nothing references it
    val b2 = Seq((12L, variant("xi")),
        (13L, "completely different words with no overlap at all whatsoever here"))
      .toDF("doc_id", "text")
    val kept = CorpusIngest.ingestBatch(b2, sigDir, bandTableName = bt)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(13L), s"orphan band rows changed decisions: ${kept.toSeq}")
    spark.sql("DROP TABLE IF EXISTS corpus_bands_orphan")
  }

  test("streaming form: checkpointed query drives the same tiers per batch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp()
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = CorpusIngest.start(docs, s"$dir/sig", s"$dir/ckpt",
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      input.addData((1L, baseText), (4L, distinctText))
      q.processAllAvailable()
      input.addData((11L, baseText), (12L, variant("xi")), (13L, "brand new content entirely"))
      q.processAllAvailable()
      val stored = spark.read.parquet(s"$dir/sig")
        .select("doc_id").as[Long].collect().sorted
      assert(stored.toSeq == Seq(1L, 4L, 13L))
    } finally q.stop()
  }

  test("streaming form strands no checkpoint blocks per micro-batch (r14 leak sweep)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = CorpusIngest.start(docs, s"$dir/sig", s"$dir/ckpt",
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      input.addData((1L, baseText), (4L, distinctText))
      q.processAllAvailable()
      input.addData((11L, baseText), (13L, "brand new content entirely"))
      q.processAllAvailable()
    } finally q.stop()
    // the per-batch sigAll and out checkpoints must both be freed — an
    // unbounded stream otherwise strands two block-manager entries per
    // micro-batch (the VectorIngest semanticDedupBatch leak class)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"stranded checkpoint RDDs: $leaked")
  }

  test("soak: block-manager entries stay FLAT across five micro-batches (r15)") {
    // the r14 leak test asserts zero stranded blocks after the stream
    // stops; this one asserts the invariant PER BATCH over a longer
    // run — the regression guard the round-14 verdict asked for: an
    // unbounded stream must hold a bounded working set, so the
    // persistent-RDD count after every micro-batch must return to the
    // pre-stream level, not grow with batch index.
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = CorpusIngest.start(docs, s"$dir/sig", s"$dir/ckpt",
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      (1 to 5).foreach { i =>
        input.addData((i * 10L, s"batch $i fresh content $i " + baseText),
          (i * 10L + 1, variant(s"soak$i")))
        q.processAllAvailable()
        val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
        assert(leaked.isEmpty,
          s"after micro-batch $i: stranded checkpoint RDDs $leaked")
      }
    } finally q.stop()
  }

  test("scrubPii: redaction runs before hashing, so PII-only variants dedup") {
    val sigDir = tmp() + "/sig"
    // same document text, differing ONLY in the embedded email — after
    // the tier-0 scrub they are byte-identical, so the exact tier keeps
    // one; and the stored md5 is of the REDACTED text (no fingerprint
    // of the unscrubbed bytes ever persists)
    val b = Seq(
      (1L, baseText + " contact alice@example.com now"),
      (2L, baseText + " contact bob@other.org now"),
      (3L, distinctText))
      .toDF("doc_id", "text")
    val kept = CorpusIngest.ingestBatch(b, sigDir, scrubPii = true)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 3L)), kept.mkString(","))
    val storedMd5 = spark.read.parquet(sigDir)
      .filter(col("doc_id") === 1L).select("__md5").as[String].head()
    val redactedMd5 = Seq(baseText + " contact [EMAIL] now").toDF("t")
      .select(md5(col("t"))).as[String].head()
    assert(storedMd5 == redactedMd5, "stored hash must be of the redacted text")
  }

  test("signature store is directly queryable by nearDupFromSignatures") {
    val sigDir = tmp() + "/sig"
    CorpusIngest.ingestBatch(
      Seq((1L, baseText), (4L, distinctText)).toDF("doc_id", "text"), sigDir)
    // accepted docs are pairwise NON-near-dup by construction
    val pairs = graft.operators.MinHashLsh.nearDupFromSignatures(
      spark.read.parquet(sigDir), 4, 2, 0.5)
    assert(pairs.count() == 0)
  }
}
