package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, GraftShim}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.expressions.BloomMightContain

/** Bloom-prefiltered exact anti-join — the 100 TB shape for "drop from a
  * huge corpus every row whose key appears in a stored key set".
  *
  * The reference's dedup probes one catalog per file
  * (`/root/reference/download/common.go:162-190`); the set-at-scale
  * generalization is an anti-join of the corpus against the stored
  * hashes. When the stored set is small it broadcasts (q04's shape) —
  * but at ~10⁹ stored keys the exact hash set (tens of GB) no longer
  * fits in an executor broadcast, and a plain anti-join degenerates to
  * shuffling BOTH sides on the key: writing + sorting the full corpus,
  * the single most expensive operation a 100 TB pipeline can run.
  *
  * The bloom sketch restores the broadcast shape: ~1.2 GB encodes 10⁹
  * keys at 1% fpp. The corpus is filtered scan-locally:
  *
  *   - bloom-NEGATIVE rows are definitively new (no false negatives) →
  *     emitted directly, never shuffled;
  *   - bloom-POSITIVE rows (true duplicates + an fpp-sized sliver of
  *     false positives) go through the exact anti-join, whose left side
  *     is now duplicates + fpp·N rows instead of N.
  *
  * The result is EXACT — the confirm join removes every false positive,
  * and no-false-negatives guarantees nothing else is lost — so the
  * DuckDB oracle is the plain `NOT EXISTS`. The corpus is scanned twice
  * (once per branch), which at scale is the deliberate trade: two
  * column-pruned scans cost far less than one full-corpus shuffle
  * (write + network + sort), and the negatives branch preserves the
  * scan's partitioning for downstream writers.
  *
  * The sketch itself is partial-aggregable (per-partition blooms OR
  * together), built once at ingest and maintained incrementally —
  * callers treat it as a stored model artifact, like the IVF centroids.
  */
object BloomDedup {
  /** Serialized bloom over `xxhash64(keyCol)` of `keys` — the stored
    * ingest-time artifact. `expectedN`/`fpp` size the sketch; fpp only
    * tunes how many rows reach the confirm join, never correctness. */
  def buildBloom(keys: DataFrame, keyCol: String,
                 expectedN: Long, fpp: Double): Array[Byte] = {
    // an EMPTY stored set is legal (first-ever ingest batch), but
    // Spark's stat.bloomFilter yields a null sketch over zero rows and
    // BloomFilter.create rejects expectedNumItems = 0 — probe actual
    // emptiness (one limit-1 job) and hand back a sketch that answers
    // false for every probe, which is exactly correct: nothing stored
    val bloom: BloomFilter =
      if (keys.isEmpty) BloomFilter.create(1, fpp)
      else keys.stat.bloomFilter(xxhash64(col(keyCol)), math.max(1L, expectedN), fpp)
    val out = new ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }

  /** Rows of `batch` whose `keyCol` appears in no row of `stored`
    * (exact `NOT EXISTS` semantics, null keys conservatively kept —
    * they reach the confirm join, where `null = x` never matches).
    *
    * `bloomBytes` must cover every `stored` key ([[buildBloom]] over
    * the same column); a stale sketch that misses stored keys breaks
    * the no-false-negative contract and with it exactness.
    */
  def newKeys(batch: DataFrame, stored: DataFrame, keyCol: String,
              bloomBytes: Array[Byte]): DataFrame = {
    val might = GraftShim.column(
      BloomMightContain(GraftShim.expression(xxhash64(col(keyCol))), bloomBytes))
    val negatives = batch.filter(!might)
    val positives = batch.filter(might)
    val survivors = positives.join(
      stored.select(col(keyCol).as("__stored_key")),
      col(keyCol) === col("__stored_key"), "left_anti")
    negatives.unionByName(survivors)
  }
}
