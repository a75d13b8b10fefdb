package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.operators.SimilarityJoin

/** Whole-operator form of the cosine all-pairs similarity join
  * (SURVEY §2.4): a custom logical node, planned by [[SimilarityStrategy]]
  * into [[CosineSelfJoinExec]] — the (c) rung of the custom-operator
  * ladder, for semantics the relational surface can't express without
  * materializing the N² intermediate ("emit only pairs above threshold
  * from an all-pairs scan").
  *
  * The exec broadcasts the (small) build side once per executor and
  * streams the probe side through a primitive loop, emitting UnsafeRows
  * directly — same kernel as [[SimilarityJoin.cosinePairs]], but
  * composable inside a larger plan: downstream operators see ordinary
  * attributes, EXPLAIN shows the operator, and no typed collect happens
  * on the query path.
  */
case class CosineSelfJoin(
    child: LogicalPlan,
    idAttr: Attribute,
    vecAttr: Attribute,
    threshold: Double,
    // constructor field (not a def): exprIds must survive case-class
    // copies made by optimizer transforms, or parent references dangle
    override val output: Seq[Attribute] = Seq(
      AttributeReference("a_id", LongType, nullable = false)(),
      AttributeReference("b_id", LongType, nullable = false)(),
      AttributeReference("sim", DoubleType, nullable = false)())) extends UnaryNode {

  // a_id/b_id/sim are generated here, not consumed from the child —
  // without this, CheckAnalysis reports them as missing inputs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override protected def withNewChildInternal(newChild: LogicalPlan): CosineSelfJoin =
    copy(child = newChild)
}

/** Plans [[CosineSelfJoin]] into [[CosineSelfJoinExec]]. Register via
  * `spark.experimental.extraStrategies` or [[GraftExtensions]]. */
object SimilarityStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: CosineSelfJoin =>
      CosineSelfJoinExec(planLater(j.child), j.idAttr, j.vecAttr, j.threshold,
        j.output) :: Nil
    case _ => Nil
  }
}

case class CosineSelfJoinExec(
    child: SparkPlan,
    idAttr: Attribute,
    vecAttr: Attribute,
    threshold: Double,
    output: Seq[Attribute]) extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override protected def doExecute(): RDD[InternalRow] = {
    val idOrd = child.output.indexWhere(_.exprId == idAttr.exprId)
    val vecOrd = child.output.indexWhere(_.exprId == vecAttr.exprId)
    require(idOrd >= 0 && vecOrd >= 0, "id/vec attributes not found in child output")

    // The child executes EXACTLY ONCE (executeCollect): both the build
    // side and the probe side come from this one materialization —
    // running child.execute() again for the probe would double upstream
    // work and, with nondeterministic children (sample, limit), would
    // produce mismatched sides. The probe side re-parallelizes as an
    // index range round-robined across partitions (the triangle's heavy
    // low indices spread evenly). At larger N this becomes a tile loop
    // over build-side blocks, same kernel per tile.
    val built = child.executeCollect().map { row =>
      (row.getLong(idOrd), row.getArray(vecOrd).toDoubleArray())
    }.sortBy(_._1)
    val norms = built.map { case (_, v) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val bc = sparkContext.broadcast((built, norms))
    val t = threshold
    val out = output

    val p = math.max(1, math.min(built.length, sparkContext.defaultParallelism))
    // parallelize() slices a Range into CONTIGUOUS blocks; index i does
    // ~(N-i) comparisons, so interleave indices (sort by i % p) to spread
    // the triangle's heavy low indices across partitions
    val interleaved = built.indices.sortBy(_ % p)
    sparkContext.parallelize(interleaved, p)
      .mapPartitions { idxs =>
        val (bRows, bNorms) = bc.value
        val proj = UnsafeProjection.create(out.map(_.dataType).toArray)
        idxs.flatMap { ai =>
          val (aIdV, av) = bRows(ai)
          val aNorm = bNorms(ai)
          val buf = Seq.newBuilder[InternalRow]
          var j = ai + 1 // built is sorted by id: bId > aId ⟺ j > ai
          while (j < bRows.length) {
            val (bIdV, bv) = bRows(j)
            if (bIdV > aIdV) {
              var s = 0.0
              var k = 0
              val n = math.min(av.length, bv.length)
              while (k < n) { s += av(k) * bv(k); k += 1 }
              val simV = SimilarityJoin.round4(s / (aNorm * bNorms(j)))
              if (simV >= t)
                buf += proj(InternalRow(aIdV, bIdV, simV)).copy()
            }
            j += 1
          }
          buf.result()
        }
      }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): CosineSelfJoinExec =
    copy(child = newChild)
}

object CosineSelfJoin {
  /** DataFrame entry: installs [[SimilarityStrategy]] on the session
    * (idempotent) and wraps `df` — columns must be (id: LONG,
    * vec: ARRAY<DOUBLE>). */
  def pairs(df: DataFrame, idCol: String, vecCol: String,
            threshold: Double): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(SimilarityStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ SimilarityStrategy
    val analyzed = df.queryExecution.analyzed
    val id = analyzed.output.find(_.name == idCol).get
    val vec = analyzed.output.find(_.name == vecCol).get
    GraftShim.ofRows(spark, CosineSelfJoin(analyzed, id, vec, threshold))
  }
}
