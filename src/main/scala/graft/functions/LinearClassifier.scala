package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch-perceptron linear classifier trained AS DATAFLOW — the
  * classifier-filter stage of an LLM data pipeline (fastText-style
  * quality/topicality gates), reduced to the one linear model whose
  * training is bit-exact across engines.
  *
  * Why a perceptron and not logistic regression: the logistic loss needs
  * `exp`, whose last-ulp behavior differs across engines and would break
  * the cross-engine oracle (the q25 floor-truncation lesson). The batch
  * perceptron needs only integer multiply-add and comparisons: features
  * quantize to `floor(x·scale)` (unambiguous in IEEE), weights live in
  * ℤ, and every update is an integer SUM — commutative, associative,
  * partition-order independent. DuckDB replays training exactly.
  *
  * Training shape at 100 TB: each round is ONE partial-aggregable scan —
  * the margin test `y·(w·x + b) ≤ 0` evaluates scan-locally against the
  * round's weight LITERALS (the IVF-centroid pattern), and the update is
  * a (dim+1)-column integer sum folded map-side. Model state is dim+1
  * integers on the driver; rounds are sequential by nature (each needs
  * the previous weights), so cost = rounds × one corpus scan, no shuffle
  * at all (the aggregation reduces to a single row).
  *
  * Overflow headroom: |w_j| ≤ rounds·N·scale and |w·x| ≤
  * dim·max|w|·scale — at N = 5×10⁷, scale = 10³, dim = 64, rounds = 3
  * the dot is ≤ 10¹⁶ < 2⁶³; margins and their sums stay exact in Long.
  */
object LinearClassifier {
  /** Integer weights + bias; the trained artifact. */
  case class Model(w: Array[Long], b: Long)

  /** `floor(x·scale)` per element as ARRAY<BIGINT> — the engine-portable
    * feature quantization (floor, never round: round's half-up tie rule
    * differs between BigDecimal and IEEE paths). */
  def quantize(vec: Column, scale: Int): Column =
    transform(vec, e => floor(e * lit(scale.toDouble)))

  /** w·x + b against weight literals: scan-local, codegen'd, exact. */
  def rawScore(x: Column, model: Model): Column = {
    val wLit = array(model.w.map(lit(_)): _*)
    aggregate(zip_with(x, wLit, (a, b) => a * b), lit(0L), (acc, v) => acc + v) +
      lit(model.b)
  }

  /** Batch-perceptron training: `rounds` × (margin test → summed update).
    *
    * Round t: mis = { i : yᵢ·(w_t·xᵢ + b_t) ≤ 0 },
    *          w_{t+1} = w_t + Σ_mis yᵢ·xᵢ,  b_{t+1} = b_t + Σ_mis yᵢ.
    * With w₀ = 0 every row starts misclassified (margin 0), so round 1
    * is the class-weighted feature mean — the standard batch variant.
    *
    * `df` must carry `xCol: ARRAY<BIGINT>` (length = dim) and
    * `yCol: BIGINT` ∈ {+1, −1}.
    */
  def train(df: DataFrame, xCol: String, yCol: String,
            dim: Int, rounds: Int): Model = {
    var model = Model(Array.fill(dim)(0L), 0L)
    (1 to rounds).foreach { _ =>
      val mis = (col(yCol) * rawScore(col(xCol), model)) <= 0
      val aggs = (0 until dim).map { j =>
        sum(when(mis, col(yCol) * col(xCol).getItem(j)).otherwise(0L)).as(s"dw$j")
      } :+ sum(when(mis, col(yCol)).otherwise(0L)).as("db")
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      def at(i: Int) = if (row.isNullAt(i)) 0L else row.getLong(i)
      model = Model(
        Array.tabulate(dim)(j => model.w(j) + at(j)),
        model.b + at(dim))
    }
    model
  }
}
