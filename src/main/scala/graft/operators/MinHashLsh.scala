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
    */
  def nearDup(docs: DataFrame, bands: Int, rowsPerBand: Int, shingleN: Int,
              minJaccard: Double): DataFrame = {
    val numHashes = bands * rowsPerBand
    val toks = TextOps.tokens(col("text"))
    val sh = array_distinct(TextOps.shingles(toks, shingleN))
    val sig = docs
      .select(col("doc_id"), sh.as("sh"))
      .select(col("doc_id") +:
        array_sort(array_distinct(transform(col("sh"), x => xxhash64(x)))).as("shh") +:
        (0 until numHashes).map(i => TextOps.minhash(col("sh"), i).as(s"h$i")): _*)
    val bandKeys = array((0 until bands).map { b =>
      concat_ws("|", lit(b.toString) +:
        (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*)
    }: _*)
    val exploded = sig.select(col("doc_id"), col("shh"), explode(bandKeys).as("bk"))
    val cand = exploded
      .select(col("bk"), col("doc_id").as("a_id"), col("shh").as("sha"))
      .join(exploded.select(col("bk"), col("doc_id").as("b_id"), col("shh").as("shb")),
        "bk")
      .filter(col("a_id") < col("b_id"))
      // a pair can collide in several bands: dedup by key; the carried
      // signatures are identical per doc, so first() is deterministic
      .groupBy(col("a_id"), col("b_id"))
      .agg(first(col("sha")).as("sha"), first(col("shb")).as("shb"))
    cand
      .withColumn("common", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jac", round(col("common").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("common")), 4))
      .filter(col("jac") >= minJaccard)
      .select(col("a_id"), col("b_id"), col("jac"))
  }
}
