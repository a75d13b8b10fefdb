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

  /** Σ (aᵢ−bᵢ)² over two ARRAY<BIGINT> columns — exact integer squared
    * L2 as a native codegen'd kernel
    * ([[graft.functions.expressions.ArraySqDistLong]]); the hot
    * assignment loop of the quantized-classifier paths (q95). */
  def sqDistLong(a: Column, b: Column): Column =
    GraftShim.column(expressions.ArraySqDistLong(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** HOF formulation of [[sqDistLong]], kept as the pure-built-ins
    * reference implementation (property-tested equal to the native). */
  def sqDistLongHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (s, x) => s + x)

  /** Deterministic sign-bit LSH bucket: bit i of the bucket id is the sign
    * of dimension i (the first `nBits` dims act as fixed hyperplanes).
    * Same-bucket vectors are cosine-close with high probability, so an
    * equi-join on the bucket id prunes the candidate set.
    *
    * Parallelism/recall model: `nBits` hyperplanes make `2^nBits`
    * buckets. A bucket equi-join's parallelism is capped at the bucket
    * count and each bucket is ~`N/2^nBits`-quadratic, so raising nBits
    * multiplies join parallelism and divides per-bucket work — at the
    * price of recall: a pair collides iff ALL nBits sign bits agree,
    * and agreement on bits [0, n) implies agreement on bits [0, m) for
    * m < n, so the nBits candidate set is a strict-or-equal SUBSET of
    * every lower-bit candidate set (spec-proven at 8 vs 4 bits). Size
    * nBits so `N/2^nBits` quadratic work fits one task — ~4 at test SF,
    * 20+ at warehouse scale.
    */
  def signBucket(a: Column, nBits: Int): Column =
    aggregate(
      zip_with(
        slice(a, 1, nBits),
        sequence(lit(0), lit(nBits - 1)),
        (x, i) => when(x > 0, pow(lit(2.0), i).cast("long")).otherwise(lit(0L))),
      lit(0L), (s, x) => s + x)

  /** All `(a_id < b_id)` same-bucket pairs with cosine ≥ `minSim` under
    * an `nBits` sign-bucket LSH — the sub-quadratic near-dup default
    * (q50's shape, parameterized). One shuffle on the bucket key; the
    * quadratic blow-up stays confined to same-bucket groups. Same-bucket
    * recall is the CONTRACT: cross-bucket pairs are out of scope by
    * definition (see [[signBucket]] for the bits ↔ parallelism ↔ recall
    * trade). Output: (a_id, b_id, sim). */
  def cosineNearDupLsh(emb: DataFrame, idCol: String, vecCol: String,
                       nBits: Int, minSim: Double): DataFrame = {
    val e = emb
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("bkt", signBucket(col("__v"), nBits))
    val a = e.select(col("bkt"), col(idCol).as("a_id"), col("__v").as("__va"))
    val b = e.select(col("bkt"), col(idCol).as("b_id"), col("__v").as("__vb"))
    a.join(b, "bkt").filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(cosine(col("__va"), col("__vb")), 4).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** Approximate top-k neighbors of `probeId` under an `nBits`
    * sign-bucket LSH (q23's shape, parameterized): the probe's bucket id
    * is a broadcast scalar, so the scan prunes ~(1 − 2^−nBits) of the
    * corpus before any vector math; exact cosine reranks the survivors.
    * Output: (idCol, sim). */
  def annSearchLsh(emb: DataFrame, idCol: String, vecCol: String,
                   probeId: Long, k: Int, nBits: Int): DataFrame = {
    val e = emb
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("bkt", signBucket(col("__v"), nBits))
    val probe = broadcast(e.filter(col(idCol) === probeId)
      .select(col("__v").as("__pv"), col("bkt").as("__pbkt")))
    e.join(probe, col("bkt") === col("__pbkt"))
      .filter(col(idCol) =!= probeId)
      .select(col(idCol), round(cosine(col("__v"), col("__pv")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** A trained IVF coarse quantizer plus the cell assignment it induces.
    * `centroids` is a local `(cid LONG, c ARRAY<DOUBLE>)` relation —
    * model-sized (nCells rows), so it broadcasts for free; `assigned` is
    * `(idCol, cell, __v)` over the full input. */
  case class IvfModel(assigned: DataFrame, centroids: DataFrame)

  private def d2Expr: Column =
    dot(col("__v"), col("__v")) - lit(2.0) * dot(col("__v"), col("__c")) +
      dot(col("__c"), col("__c"))

  /** Nearest-centroid assignment (ties → lowest cid); `cents` must have
    * columns (__cid, __c). dist² expands to ‖v‖² − 2⟨v,c⟩ + ‖c‖² so both
    * engines (and the oracle) evaluate identical IEEE ops. */
  private def assignCells(rel: DataFrame, keyCol: String, cents: DataFrame): DataFrame =
    rel.crossJoin(broadcast(cents))
      .groupBy(col(keyCol))
      .agg(min_by(col("__cid"), struct(d2Expr.as("d"), col("__cid"))).as("cell"),
           first(col("__v")).as("__v"))

  /** Assign NEW vectors to an already-trained quantizer's cells — the
    * incremental-ingest path ([[graft.streaming.VectorIngest]]): the
    * model's centroids broadcast, identical IEEE distance expansion and
    * lowest-cid tie-break as training-time assignment, no retraining.
    * Output: (idCol, cell, __v) — `__v` as ARRAY<DOUBLE>. */
  def assignTo(emb: DataFrame, idCol: String, vecCol: String,
               model: IvfModel): DataFrame =
    assignCells(
      emb.select(col(idCol), col(vecCol).cast("array<double>").as("__v")),
      idCol, model.centroids)

  /** IVF coarse quantizer: k-means over a deterministic hash sample.
    *
    * Training is data-order-independent: the `sampleN` training vectors
    * (and the initial `nCells` centroids) are the rows with the smallest
    * `(md5(id), id)` — a reproducible uniform sample, unlike "first N
    * ids", whose cell balance was hostage to id assignment order. `iters`
    * Lloyd steps refine: assign the sample to its nearest centroid, move
    * each centroid to the element-wise mean of its members (empty cells
    * keep their previous position). Means are rounded to 6 dp so the
    * ulp-level order-dependence of parallel double summation (Spark task
    * merge order, DuckDB's aggregate order) cannot flip a downstream
    * assignment — the oracle replays the identical unrolled computation.
    *
    * The trained centroids are collected: nCells × dim doubles is a
    * MODEL, not a corpus (the classic offline IVF train step), and the
    * local relation keeps every downstream use a broadcast.
    *
    * Scale path: training cost is bounded by `sampleN` regardless of N;
    * the full-corpus pass is one broadcast-assign scan; with the table
    * written partitioned by `cell`, a probe reads one partition (classic
    * IVF-Flat layout).
    */
  def ivfModel(emb: DataFrame, idCol: String, vecCol: String, nCells: Int,
               sampleN: Int = 256, iters: Int = 2): IvfModel = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val hashed = e.withColumn("__h", md5(col(idCol).cast("string")))
    val train = hashed.orderBy(col("__h"), col(idCol)).limit(sampleN)
      .select(col(idCol).as("__tid"), col("__v"))
    // Seed ranks: ORDER BY + LIMIT runs as TakeOrderedAndProject, and the
    // collected rows arrive in that (md5, id) order, so ranking the
    // ≤ nCells seed rows locally replaces the former global
    // row_number() window (a 1-partition WindowExec over model-sized
    // data — harmless, but it tripped the "No Partition Defined"
    // warning on every training run).
    val seedRows = hashed.orderBy(col("__h"), col(idCol)).limit(nCells)
      .select(col("__v")).collect().map(_.getSeq[Double](0))
    val seeds = spark.createDataset(
        seedRows.toSeq.zipWithIndex.map { case (v, i) => (i.toLong, v) })
      .toDF("__cid", "__c")
      .select(col("__cid"), col("__c").cast("array<double>").as("__c"))
    var cents = seeds
    for (_ <- 1 to iters) {
      val asg = assignCells(train, "__tid", cents)
      val upd = asg.select(col("cell"), posexplode(col("__v")))
        .groupBy(col("cell"), col("pos"))
        .agg(round(avg(col("col")), 6).as("cx"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("px"))
        .select(col("cell").as("__ucid"),
          transform(col("px"), p => p.getField("cx")).as("__uc"))
      cents = cents.join(upd, col("__cid") === col("__ucid"), "left")
        .select(col("__cid"), coalesce(col("__uc"), col("__c")).as("__c"))
    }
    // materialize the model (nCells rows) so downstream plans broadcast a
    // LocalRelation instead of replaying the training lineage per action
    val centRows = cents.orderBy(col("__cid")).collect().map { r =>
      (r.getLong(0), r.getSeq[Double](1))
    }
    val centsLocal = spark.createDataset(centRows.toSeq).toDF("__cid", "__c")
      .select(col("__cid"), col("__c").cast("array<double>").as("__c"))
    IvfModel(assignCells(e, idCol, centsLocal), centsLocal)
  }

  /** Full-corpus cell assignment under the trained quantizer. */
  def ivfAssign(emb: DataFrame, idCol: String, vecCol: String, nCells: Int,
                sampleN: Int = 256, iters: Int = 2): DataFrame =
    ivfModel(emb, idCol, vecCol, nCells, sampleN, iters).assigned

  /** The round-1 naive quantizer — first `nCells` ids as centroids, no
    * refinement. Kept as the recall baseline the spec compares against:
    * its cell balance depends entirely on id order. */
  def ivfAssignByFirstIds(emb: DataFrame, idCol: String, vecCol: String,
                          nCells: Int): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val cents = e.filter(col(idCol) < nCells)
      .select(col(idCol).as("__cid"), col("__v").as("__c"))
    assignCells(e, idCol, cents)
  }

  /** IVF-Flat search: top-k cosine among the probe-cell's vectors. */
  def ivfSearch(emb: DataFrame, idCol: String, vecCol: String,
                nCells: Int, probeId: Long, k: Int,
                assignedOverride: Option[DataFrame] = None): DataFrame = {
    val assigned = assignedOverride.getOrElse(ivfAssign(emb, idCol, vecCol, nCells))
    val probe = broadcast(assigned.filter(col(idCol) === probeId)
      .select(col("__v").as("__pv"), col("cell").as("__pcell")))
    assigned.join(probe, col("cell") === col("__pcell"))
      .filter(col(idCol) =!= probeId)
      .select(col(idCol), round(cosine(col("__v"), col("__pv")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Batch kNN JOIN over a cell assignment: every vector's top-k cosine
    * neighbors within its IVF cell (q76's operator). One equi-join on
    * the cell id confines the quadratic candidate work to (N/cells)² per
    * cell; the per-vector top-k is a window over surviving pairs.
    *
    * THE SCALE DIAL: candidate pairs total cells·(N/cells)² = N²/cells,
    * so hold N/cells roughly constant as the corpus grows (the probe
    * demonstrates 8 cells at 5k ≈ 64 cells at 50k; fixed cells at 10×
    * rows is 100× pair work). Same-cell recall is the contract; q45's
    * multi-probe is the recall dial. Output: (a_id, r, b_id, sim),
    * unordered — callers add their total ORDER BY. */
  def knnJoin(assigned: DataFrame, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = assigned.select(col("cell"), col(idCol).as("a_id"),
      col("__v").as("__va"))
    val b = assigned.select(col("cell"), col(idCol).as("b_id"),
      col("__v").as("__vb"))
    val w = Window.partitionBy(col("a_id")).orderBy(col("sim").desc, col("b_id"))
    a.join(b, "cell").filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(cosine(col("__va"), col("__vb")), 4).as("sim"))
      .withColumn("r", row_number().over(w).cast("long"))
      .filter(col("r") <= k)
      .select(col("a_id"), col("r"), col("b_id"), col("sim"))
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
