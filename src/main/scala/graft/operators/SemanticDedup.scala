package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** One clustered, integer-quantized vector: the unit of SemDeDup's
  * within-cluster comparison. */
case class CellVec(cell: Long, vec_id: Long, q: Array[Long])

/** Per-cluster semantic-dedup outcome. */
case class CellDedup(cell: Long, n_members: Long, n_dup_pairs: Long,
                     n_removed: Long, n_survivors: Long)

/** SEMANTIC DEDUP (SemDeDup-style): remove embedding-space duplicates
  * WITHIN quantizer cells — the curation step between exact/near-dup
  * text dedup (q04/q19: same bytes or same shingles) and nothing: two
  * documents can share no 3-gram yet embed within ε of each other
  * (translations, templated rewrites, near-paraphrases), and the
  * published recipe (Abbas et al., SemDeDup) is k-means the embedding
  * space, then pairwise-compare ONLY within each cluster, keeping one
  * representative per duplicate set.
  *
  * This operator is the cluster-bounded exact tier: grouped by cell,
  * each task folds its cell's members with a compiled i<j loop —
  * integer cosine² threshold (quantized grid in, `dot² · DEN ≥ NUM ·
  * ‖a‖² · ‖b‖²` over BIGINTs, so no float ever crosses an engine
  * boundary) — and emits ONE stats row per cell: members, dup pairs,
  * removed (members with a smaller-id duplicate — the deterministic
  * keep-first contract of [[HashDedup.keepFirst]]), survivors. Pairs
  * never leave the task; the exchange carries vectors once and rows
  * out equal the cell count.
  *
  * Scale shape: the quadratic work is N²/cells per cell — the cell
  * count is the N²/cells dial (the q76 IVF precedent, measured both
  * ways in §6.1), and a cell's members must fit a task (the SemDeDup
  * paper's own k ≈ √N regime; sub-shard a degenerate cell by hash to
  * bound it, the q298 shard rationale). Within-cluster-only compare
  * is the method's documented recall boundary: a duplicate pair
  * straddling two cells is not a candidate, exactly as published.
  */
object SemanticDedup {
  /** Per-cell dedup stats over quantized vectors; τ² = tau2Num/tau2Den.
    * Caller quantizes to an integer grid (round(x·1000) — the shared
    * quantizer discipline) so all arithmetic here is exact Long. */
  def withinCellStats(vecs: DataFrame, tau2Num: Long, tau2Den: Long)
      : DataFrame = {
    val spark = vecs.sparkSession
    implicit val enc = Encoders.product[CellDedup]
    vecs.select(col("cell"), col("vec_id"), col("q"))
      .as[CellVec](Encoders.product[CellVec])
      .groupByKey(_.cell)(Encoders.scalaLong)
      .flatMapGroups { (cell: Long, it: Iterator[CellVec]) =>
        // sorted by vec_id: "removed" = has a DUP with a smaller id,
        // so the loop below marks j for every passing (i < j) pair
        val rows = it.toArray.sortBy(_.vec_id)
        val n = rows.length
        val nrm = new Array[Long](n)
        var i = 0
        while (i < n) {
          val q = rows(i).q; var s = 0L; var k = 0
          while (k < q.length) { s += q(k) * q(k); k += 1 }
          nrm(i) = s; i += 1
        }
        var pairs = 0L
        val removed = new Array[Boolean](n)
        i = 0
        while (i < n) {
          val qa = rows(i).q
          var j = i + 1
          while (j < n) {
            val qb = rows(j).q
            var dt = 0L; var k = 0
            val m = math.min(qa.length, qb.length)
            while (k < m) { dt += qa(k) * qb(k); k += 1 }
            if (dt > 0 && dt * dt * tau2Den >= tau2Num * nrm(i) * nrm(j)) {
              pairs += 1; removed(j) = true
            }
            j += 1
          }
          i += 1
        }
        var nRem = 0L
        i = 0
        while (i < n) { if (removed(i)) nRem += 1; i += 1 }
        Iterator.single(CellDedup(cell, n.toLong, pairs, nRem, n - nRem))
      }
      .toDF()
  }
}
