package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Parameterized MinHash + LSH near-duplicate detection.
  *
  * `bands` × `rowsPerBand` minhash components; two documents become a
  * candidate pair iff SOME band's component vector matches exactly, so
  * the candidate probability follows the S-curve
  * `P(s) = 1 − (1 − s^r)^b` ([[collisionProbability]]) with its steep
  * step near `(1/b)^(1/r)` ([[sCurveThreshold]]): more bands catch
  * lower-similarity pairs (recall↑, candidates↑), more rows per band
  * sharpen the cutoff. Candidates are then verified by EXACT Jaccard
  * over hashed shingle sets, so parameters trade recall/cost only —
  * never precision.
  *
  * Scale shape: signature computation is one embarrassingly-parallel
  * scan; the band join shuffles on the band key only, confining the
  * quadratic blowup to same-band buckets. Signatures ride THROUGH the
  * band shuffle to the verify step (computed once, no cached plan, no
  * second corpus scan) — at 100 TB they are precomputed ingest columns
  * and the band join is the whole query.
  */
object MinHashLsh {

  /** P[some band fully collides] for true Jaccard `s`: 1 − (1 − s^r)^b. */
  def collisionProbability(s: Double, bands: Int, rowsPerBand: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), bands)

  /** The S-curve's steep point ≈ (1/b)^(1/r): pairs above it are likely
    * candidates, below it likely skipped. */
  def sCurveThreshold(bands: Int, rowsPerBand: Int): Double =
    math.pow(1.0 / bands, 1.0 / rowsPerBand)

  /** All (a_id < b_id) pairs among LSH candidates whose exact Jaccard
    * (over distinct word `shingleN`-grams) rounds to ≥ `minJaccard`.
    * `docs` needs columns (doc_id, text). Output: (a_id, b_id, jac).
    *
    * Plan shape: one linear pipeline — signature scan → band explode →
    * bucket collect → combination explode → pair dedup → exact verify —
    * so the expensive shingle/minhash scan runs exactly ONCE (a band
    * self-join would recompute it per side; a cache would leak past the
    * query). The hashed shingle sets ride into the buckets, so a bucket
    * of k members holds k signature arrays and emits its ~k²/2 pairs
    * from one task: acceptable because LSH's whole premise is that
    * buckets stay small, and documents with EMPTY shingle sets — which
    * would otherwise all share one degenerate null-minhash band key —
    * are filtered up front (an empty set has Jaccard 0 with everything,
    * so they can never reach the output). At ingest scale, signatures
    * are precomputed columns and a slim band join + candidate re-join is
    * the right shape; here that costs 2 extra corpus scans per query.
    */
  def nearDup(docs: DataFrame, bands: Int, rowsPerBand: Int, shingleN: Int,
              minJaccard: Double): DataFrame =
    nearDupFromSignatures(signatures(docs, bands * rowsPerBand, shingleN),
      bands, rowsPerBand, minJaccard)

  /** Ingest-time signature computation: `(doc_id, shh ARRAY<LONG>,
    * mh ARRAY<STRING>)` — the hashed shingle set (exact-verify carrier)
    * and the minhash family. At 100 TB these are computed ONCE at ingest
    * and stored as table columns next to the text;
    * [[nearDupFromSignatures]] then runs candidate generation + verify
    * without ever touching the text again. Native fused kernels for the
    * hot scan: WordShingles makes one pass over the string (the HOF
    * stack re-evaluated its captured split() once per shingle position —
    * quadratic in document length) and MinHashes computes the whole
    * family with one reused digest per row; both are property-tested
    * bit-equal to the HOF formulations, so the DuckDB oracle is
    * untouched. Empty-shingle docs are excluded (Jaccard 0 with
    * everything; they'd otherwise share one degenerate null-minhash band
    * key). */
  def signatures(docs: DataFrame, numHashes: Int, shingleN: Int): DataFrame =
    docs
      .select(col("doc_id"), TextOps.shinglesNative(col("text"), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        array_sort(array_distinct(transform(col("sh"), x => xxhash64(x)))).as("shh"),
        TextOps.minhashesNative(col("sh"), numHashes).as("mh"))

  /** Candidate generation + exact verify over precomputed signatures
    * (schema per [[signatures]]); `bands * rowsPerBand` must not exceed
    * the stored family size. */
  def nearDupFromSignatures(sig: DataFrame, bands: Int, rowsPerBand: Int,
                            minJaccard: Double): DataFrame = {
    val bandKeys = array((0 until bands).map { b =>
      concat_ws("|", lit(b.toString) +:
        (0 until rowsPerBand).map(r => col("mh").getItem(b * rowsPerBand + r)): _*)
    }: _*)
    // Single-consumption pipeline: scan → band explode → bucket agg →
    // pair explode → pair dedup → verify. The expensive signature scan
    // feeds exactly one downstream tree, so it runs ONCE — no self-join
    // whose two sides would each recompute it, no cached plan. The
    // hashed shingle sets ride along into the buckets (at ingest scale
    // they are precomputed columns); quadratic pair expansion stays
    // confined to same-band buckets, as LSH intends.
    val bucketed = sig
      .select(explode(bandKeys).as("bk"), struct(col("doc_id"), col("shh")).as("ds"))
      .groupBy(col("bk"))
      .agg(collect_list(col("ds")).as("ms"))
      .filter(size(col("ms")) > 1)
    val pairs = bucketed.select(explode(
      flatten(transform(col("ms"), (x, i) =>
        transform(slice(col("ms"), i + 2, greatest(size(col("ms")) - i - 1, lit(0))),
          y => when(x.getField("doc_id") < y.getField("doc_id"),
              struct(x.as("a"), y.as("b")))
            .otherwise(struct(y.as("a"), x.as("b"))))))).as("p"))
    pairs
      .select(col("p.a.doc_id").as("a_id"), col("p.b.doc_id").as("b_id"),
        col("p.a.shh").as("sha"), col("p.b.shh").as("shb"))
      // a pair can collide in several bands: dedup by key (signatures
      // are identical per doc, so any representative verifies)
      .groupBy(col("a_id"), col("b_id"))
      .agg(first(col("sha")).as("sha"), first(col("shb")).as("shb"))
      .withColumn("common", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jac", round(col("common").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("common")), 4))
      .filter(col("jac") >= minJaccard)
      .select(col("a_id"), col("b_id"), col("jac"))
  }
}
