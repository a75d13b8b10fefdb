package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.MinHashLsh

/** STREAMING CORPUS BUILDER — the end-to-end dedup ingestion shape a
  * training-data pipeline runs continuously: each micro-batch of
  * documents is deduplicated in three tiers and the survivors'
  * signatures are appended to the stored corpus, so later batches
  * dedup against everything accepted so far.
  *
  * Per batch:
  *   1. EXACT within batch: md5 keep-first (lowest doc_id survives).
  *   2. NEAR-DUP within batch: [[MinHashLsh.nearDup]] pairs collapsed
  *      greedily — a doc is dropped iff it near-duplicates a LOWER-id
  *      batch survivor candidate (b_id of any pair dies, keep-first
  *      again; one anti-join, no iteration — a near-dup CHAIN thus
  *      keeps its lowest id and may keep later members whose only link
  *      was a dropped middle doc, the standard greedy tradeoff;
  *      [[graft.operators.DedupClusters]] is the transitive batch-mode
  *      alternative).
  *   3. AGAINST THE STORE: [[MinHashLsh.nearDupAgainst]] — batch
  *      signatures joined to STORED signatures; any hit drops the new
  *      doc. Per-batch cost is proportional to the batch; at 100 TB the
  *      stored side is the bucketed band table and only the batch's
  *      slim band rows shuffle.
  *
  * Survivor signatures (doc_id, shh, mh) append to `sigDir`. The
  * checkpoint makes delivery effectively-once at the SOURCE; the
  * parquet append itself is at-least-once on crash-retry (a replayed
  * batch re-dedups against the store, and docs it appended before the
  * crash are now IN the store, so replays converge — re-appended
  * signatures of identical content are prevented by tier 3; the md5
  * column guards the exact tier).
  *
  * The signature store IS the corpus index: near-dup queries, ANN
  * seeding and incremental dedup all read it without touching text.
  */
object CorpusIngest {

  /** Signatures of accepted documents so far; empty on first batch. */
  private def storedSignatures(spark: org.apache.spark.sql.SparkSession,
                               sigDir: String): Option[DataFrame] =
    try {
      val df = spark.read.parquet(sigDir)
      if (df.columns.contains("doc_id")) Some(df) else None
    } catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** One micro-batch through the three dedup tiers; returns the
    * survivors' signature rows that were appended (for tests /
    * metrics). Exposed separately so batch backfills can reuse the
    * exact semantics of the stream. */
  def ingestBatch(batch: DataFrame, sigDir: String,
                  bands: Int = 4, rowsPerBand: Int = 2, shingleN: Int = 3,
                  numHashes: Int = 8, minJaccard: Double = 0.5,
                  scrubPii: Boolean = false,
                  bandTableName: Option[String] = None): DataFrame = {
    val spark = batch.sparkSession
    // tier 0 (optional): PII scrub INSIDE the ingest projection —
    // redaction happens before any hash/signature is derived, so the
    // store never carries fingerprints of unscrubbed text (and two docs
    // differing only in redacted values dedup as the duplicates they
    // are). Scan-local, no extra pass.
    val cleaned =
      if (scrubPii)
        batch.withColumn("text", graft.functions.TextOps.redactPii(col("text")))
      else batch
    // tier 1: exact content dedup, keep-first by doc_id
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__md5")).orderBy(col("doc_id"))
    val exact = cleaned.select(col("doc_id"), col("text"))
      .withColumn("__md5", md5(col("text")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // signatures computed ONCE per batch (the hot text-kernel scan) and
    // shared by tiers 2 and 3 — tier 2 via the stored-signature band
    // join, tier 3 by filtering to tier-2 survivors; banding from the
    // same mh family also keeps batch keys comparable with the store's
    val sigAll = MinHashLsh.signatures(
        exact.select(col("doc_id"), col("text")), numHashes, shingleN)
      .join(exact.select(col("doc_id"), col("__md5")), "doc_id")
      .localCheckpoint() // two consumers — don't re-run the kernel scan
    // tier 2: near-dup within batch — b_id of any pair dies (keep-first)
    val pairs = MinHashLsh.nearDupFromSignatures(sigAll, bands, rowsPerBand,
      minJaccard)
    val batchKept = exact.join(pairs.select(col("b_id").as("doc_id")),
      Seq("doc_id"), "left_anti")
    // tier 3: against the stored corpus
    val sig = sigAll.join(batchKept.select(col("doc_id")), "doc_id")
    val accepted = storedSignatures(spark, sigDir) match {
      case Some(stored) =>
        // exact vs store (md5 equality) + near-dup vs store. With a
        // band table maintained (the 100 TB steady state), the stored
        // side's band keys come from the BUCKETED layout — zero band-
        // key Exchange, stored signatures never re-banded per batch
        // ([[MinHashLsh.nearDupAgainstBands]]); without one, the keys
        // recompute from stored `mh` ([[MinHashLsh.nearDupAgainst]]).
        val nearHits = bandTableName
          .filter(spark.catalog.tableExists) match {
            case Some(bt) => MinHashLsh.nearDupAgainstBands(
              sig, spark.table(bt), stored, bands, rowsPerBand, minJaccard)
            case None => MinHashLsh.nearDupAgainst(
              sig, stored, bands, rowsPerBand, minJaccard)
          }
        sig
          .join(stored.select(col("__md5")).distinct(), Seq("__md5"), "left_anti")
          .join(nearHits.select(col("new_id").as("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
      case None => sig
    }
    val out = accepted.select(col("doc_id"), col("shh"), col("mh"), col("__md5"))
      .localCheckpoint() // materialize BEFORE appending to the dir we read
    // band rows append BEFORE the signature store, deliberately: a crash
    // between the two writes then leaves orphan band rows, which are
    // harmless (candidates verify against storedSig by inner join, and
    // the replayed batch re-appends both). The reverse order would be a
    // permanent recall hole: sig rows in the store make the replay's
    // md5 anti-join drop the survivors, so their band keys would never
    // be written and later batches could never near-dup against them.
    bandTableName.foreach { bt =>
      MinHashLsh.bandTable(out, bands, rowsPerBand)
        .write.mode(SaveMode.Append)
        .bucketBy(32, "bk").sortBy("bk")
        .format("parquet").saveAsTable(bt)
    }
    out.write.mode(SaveMode.Append).parquet(sigDir)
    out
  }

  /** The continuous form: a streaming docs source (doc_id, text) driven
    * through [[ingestBatch]] per micro-batch. Forwards every tuning
    * knob [[ingestBatch]] exposes — a stream pinned to defaults would
    * silently band a backfill's differently-sized signature family
    * with mismatched keys, degrading cross-batch dedup recall. */
  def start(docs: DataFrame, sigDir: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            bands: Int = 4, rowsPerBand: Int = 2, shingleN: Int = 3,
            numHashes: Int = 8, minJaccard: Double = 0.5,
            scrubPii: Boolean = false,
            bandTableName: Option[String] = None): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, sigDir, bands, rowsPerBand, shingleN,
          numHashes, minJaccard, scrubPii, bandTableName): Unit
      }
      .start()
}
