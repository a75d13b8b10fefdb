package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product Quantization (PQ) — the memory side of warehouse-scale ANN.
  *
  * IVF (VectorOps.ivfModel) bounds how much of the corpus a probe READS;
  * PQ bounds how many bytes per vector the scan TOUCHES: each vector is
  * split into `m` subspaces and every subspace is vector-quantized to one
  * of `k` centroids, so a d-dim float vector (8·d bytes as doubles)
  * compresses to `m` small codes (m bytes at k ≤ 256). Search runs
  * Asymmetric Distance Computation (ADC): the probe pre-computes one
  * m×k lookup table of partial distances, then every corpus vector's
  * approximate distance is m table lookups over its CODES — the original
  * vectors never leave storage until the final shortlist rerank.
  *
  * Spark-first shape, mirroring the IVF design:
  *  - the codebooks are a trained MODEL (m·k rows, collected and
  *    memoized) — training cost bounded by `sampleN` regardless of N;
  *  - [[encode]] is scan-local: the per-subspace argmin unrolls to a
  *    codegen'd expression over centroid LITERALS (no join, no shuffle)
  *    — the ingest-time step that stores `codes` beside the table;
  *  - [[adcSearch]] is one codes-scan: the LUT folds to an array literal
  *    and the approximate distance is `aggregate(zip_with(...))` over it,
  *    followed by TakeOrderedAndProject (per-partition top-k, no global
  *    sort) and an exact cosine rerank of the tiny shortlist.
  *
  * Determinism contract (oracle-replayable, like the IVF quantizer):
  * training means round to 6 dp; LUT partial distances are fixed to
  * integer MICRO-units (round(d²·1e6) as LONG) so the ADC sum is exact
  * integer arithmetic — no float summation order can flip the shortlist
  * in either engine. d² always expands to ‖a‖² − 2⟨a,b⟩ + ‖b‖² so Spark
  * and DuckDB evaluate identical IEEE ops.
  */
object Pq {
  /** Trained PQ codebooks. `cents` is the local (m·k)-row relation
    * (__csub INT, __cid LONG, __c ARRAY<DOUBLE>); `centsArr(sub)(cid)`
    * is the same model as driver-side literals for scan-local encode. */
  case class PqModel(m: Int, k: Int, dsub: Int,
                     centsArr: Array[Array[Array[Double]]],
                     cents: DataFrame)

  /** ‖v‖² − 2⟨v,c⟩ + ‖c‖² over ARRAY<DOUBLE> columns — the shared
    * distance expansion (same IEEE op sequence as the oracle's
    * `list_inner_product` formulation). */
  private def d2(v: Column, c: Column): Column =
    VectorOps.dot(v, v) - lit(2.0) * VectorOps.dot(v, c) + VectorOps.dot(c, c)

  /** Train per-subspace codebooks with the ivfModel recipe, keyed by
    * subspace: hash-sampled train set (smallest `(md5(id), id)` — data-
    * order-independent), first-k sample rows seed every subspace, `iters`
    * Lloyd steps of assign → 6-dp-rounded element-wise mean (empty cells
    * keep their position). All m subspaces train in ONE dataflow (the
    * subspace id is just another grouping key), then the m·k centroids
    * collect into the model — m·k·dsub doubles, not a corpus. */
  def train(emb: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
            sampleN: Int = 256, iters: Int = 2): PqModel = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val ordered = e.withColumn("__h", md5(col(idCol).cast("string")))
      .orderBy(col("__h"), col(idCol))
    // Seeds: the first k sample rows in hash order, each sliced into its
    // m subvectors (collected: k rows — model-sized, the ivfModel shape).
    val seedRows = ordered.limit(k).select(col("__v")).collect()
      .map(_.getSeq[Double](0))
    require(seedRows.length >= k,
      s"PQ training needs at least k=$k rows to seed codebooks; got ${seedRows.length}")
    val dim = seedRows.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val seedSeq = for {
      (v, cid) <- seedRows.toSeq.zipWithIndex
      sub <- 0 until m
    } yield (sub, cid.toLong, v.slice(sub * dsub, (sub + 1) * dsub))
    var cents = spark.createDataset(seedSeq).toDF("__csub", "__cid", "__c")
      .select(col("__csub"), col("__cid"),
        col("__c").cast("array<double>").as("__c"))
    // Training subvectors: one row per (sample row, subspace).
    val tsv = ordered.limit(sampleN)
      .select(col(idCol).as("__tid"),
        posexplode(array((0 until m).map(j =>
          slice(col("__v"), j * dsub + 1, dsub)): _*)))
      .toDF("__tid", "__sub", "__sv")
    for (_ <- 1 to iters) {
      val asg = tsv.join(broadcast(cents), col("__sub") === col("__csub"))
        .groupBy(col("__tid"), col("__sub"))
        .agg(min_by(col("__cid"),
            struct(d2(col("__sv"), col("__c")).as("d"), col("__cid"))).as("cell"),
          first(col("__sv")).as("__sv"))
      val upd = asg.select(col("__sub"), col("cell"), posexplode(col("__sv")))
        .groupBy(col("__sub"), col("cell"), col("pos"))
        .agg(round(avg(col("col")), 6).as("cx"))
        .groupBy(col("__sub"), col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("px"))
        .select(col("__sub").as("__usub"), col("cell").as("__ucid"),
          transform(col("px"), p => p.getField("cx")).as("__uc"))
      cents = cents.join(upd,
          col("__csub") === col("__usub") && col("__cid") === col("__ucid"),
          "left")
        .select(col("__csub"), col("__cid"),
          coalesce(col("__uc"), col("__c")).as("__c"))
    }
    val rows = cents.orderBy(col("__csub"), col("__cid")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
    val arr = Array.tabulate(m, k) { (j, c) =>
      rows.find(t => t._1 == j && t._2 == c)
        .getOrElse(sys.error(s"missing centroid ($j, $c)"))._3.toArray
    }
    val local = spark.createDataset(rows.toSeq).toDF("__csub", "__cid", "__c")
      .select(col("__csub"), col("__cid"),
        col("__c").cast("array<double>").as("__c"))
    PqModel(m, k, dsub, arr, local)
  }

  /** The scan-local codes expression: `codes[j] = argmin_c d²(v_j,
    * centroid_jc)` (ties → lowest code, via array_position's
    * first-match). The centroids are LITERALS, so the result is one
    * codegen'd projection — no join, no shuffle; ‖c‖² constant-folds.
    * Attachable to ANY relation carrying the vector column (e.g. the
    * IVF-assigned relation for the combined layout). */
  def codesColumn(v: Column, model: PqModel): Column =
    array((0 until model.m).map { j =>
      val sv = slice(v, j * model.dsub + 1, model.dsub)
      val ds = array((0 until model.k).map { c =>
        d2(sv, lit(model.centsArr(j)(c)))
      }: _*)
      (array_position(ds, array_min(ds)) - 1).cast("long")
    }: _*)

  /** Scan-local PQ encoding — the ingest-time step: store `codes`
    * beside the table and [[adcSearch]] never touches the float vectors
    * again. Output: (idCol, codes). */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
             model: PqModel): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    e.select(col(idCol), codesColumn(col("__v"), model).as("codes"))
  }

  /** The probe's ADC lookup table as m·k integer micro-unit partial
    * distances, computed IN the dataflow (model × one probe row — the
    * same IEEE ops the oracle replays) and collected: query-compile-time
    * state, model-sized. `probe` must be a 1-row (__pv ARRAY<DOUBLE>)
    * relation. */
  private def probeLut(model: PqModel, probe: DataFrame): Array[Long] = {
    val dsub = model.dsub
    val lutRows = model.cents.crossJoin(broadcast(probe))
      .select(col("__csub"), col("__cid"),
        round(d2(slice(col("__pv"), col("__csub") * dsub + 1, lit(dsub)),
          col("__c")) * lit(1e6), 0).cast("long").as("pd"))
      .collect()
    require(lutRows.nonEmpty, "probe row not found")
    val flat = new Array[Long](model.m * model.k)
    lutRows.foreach(r => flat(r.getInt(0) * model.k + r.getLong(1).toInt) = r.getLong(2))
    flat
  }

  /** Approximate distance of a codes row under a LUT literal: m
    * element_at lookups + an exact integer sum, fully inside codegen. */
  private def adcApprox(codes: Column, lutFlat: Array[Long], m: Int, k: Int): Column =
    aggregate(
      zip_with(codes, sequence(lit(0), lit(m - 1)),
        (c, j) => element_at(lit(lutFlat), (j * k + c + 1).cast("int"))),
      lit(0L), (s, x) => s + x)

  /** ADC top-k: approximate distances from the probe's lookup table over
    * stored codes, exact cosine rerank of the `shortlist` best.
    *
    * The LUT is computed IN the dataflow (model × one probe row — the
    * same IEEE ops the oracle replays), collected to m·k integers, and
    * folded into the scan as an array literal: the hot path is one
    * codes-scan whose per-row cost is m `element_at`s + an integer sum,
    * then TakeOrderedAndProject keeps `shortlist` rows and only THOSE
    * rejoin the float vectors for the exact rerank. At 100 TB with
    * stored codes this reads m bytes per vector instead of 8·d.
    * Output: (idCol, approx_d2u, sim), top `topK` by exact cosine. */
  def adcSearch(emb: DataFrame, idCol: String, vecCol: String, model: PqModel,
                probeId: Long, shortlist: Int, topK: Int,
                codesOverride: Option[DataFrame] = None): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val probe = e.filter(col(idCol) === probeId).select(col("__v").as("__pv"))
    val lut = probeLut(model, probe)
    val codes = codesOverride.getOrElse(encode(emb, idCol, vecCol, model))
    val short = codes.filter(col(idCol) =!= probeId)
      .select(col(idCol),
        adcApprox(col("codes"), lut, model.m, model.k).as("approx_d2u"))
      .orderBy(col("approx_d2u"), col(idCol))
      .limit(shortlist)
    e.join(broadcast(short), Seq(idCol))
      .crossJoin(broadcast(probe))
      .select(col(idCol), col("approx_d2u"),
        round(VectorOps.cosine(col("__v"), col("__pv")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(topK)
  }

  /** IVF-PQ: the production warehouse ANN layout — the IVF cell prunes
    * WHICH rows the scan touches (at scale: partition pruning on a
    * stored `cell` column), PQ codes bound HOW MANY bytes each touched
    * row costs, and the exact rerank pays full-vector cost only on the
    * shortlist. `assigned` is [[VectorOps.IvfModel.assigned]]
    * (idCol, cell, __v); codes attach scan-locally so the combined
    * relation is exactly what ingest would store. Output:
    * (idCol, approx_d2u, sim), top `topK` by exact cosine among the
    * probe-cell's ADC shortlist. */
  def ivfPqSearch(assigned: DataFrame, idCol: String, model: PqModel,
                  probeId: Long, shortlist: Int, topK: Int): DataFrame = {
    val withCodes = assigned.select(col(idCol), col("cell"), col("__v"),
      codesColumn(col("__v"), model).as("codes"))
    val probeRow = assigned.filter(col(idCol) === probeId)
    val lut = probeLut(model, probeRow.select(col("__v").as("__pv")))
    val probe = broadcast(probeRow
      .select(col("__v").as("__pv"), col("cell").as("__pcell")))
    withCodes.join(probe, col("cell") === col("__pcell"))
      .filter(col(idCol) =!= probeId)
      .select(col(idCol), col("__v"), col("__pv"),
        adcApprox(col("codes"), lut, model.m, model.k).as("approx_d2u"))
      .orderBy(col("approx_d2u"), col(idCol))
      .limit(shortlist)
      .select(col(idCol), col("approx_d2u"),
        round(VectorOps.cosine(col("__v"), col("__pv")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(topK)
  }
}
