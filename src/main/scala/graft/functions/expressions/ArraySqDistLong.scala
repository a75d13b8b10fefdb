package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Σ (aᵢ−bᵢ)² over two ARRAY<BIGINT> columns as a native codegen'd
  * Catalyst expression — the integer squared-L2 kernel behind the
  * micro-unit-quantized classifier paths (q95's nearest-centroid
  * assignment). The HOF formulation (`aggregate(zip_with(...))`)
  * evaluates two interpreted lambdas per element; this is a tight
  * primitive loop, the [[ArrayDot]] discipline for exact integer
  * distances (overflow-safe by construction at the call sites: with
  * |x| ≤ 2·10⁶ micro-units and 64 dims, Σ ≤ 64·(4·10⁶)² ≈ 2⁶⁰ < 2⁶³).
  *
  * Null semantics: null if either side is null; null ELEMENTS
  * contribute 0, matching the repo's other array kernels.
  */
case class ArraySqDistLong(left: Expression, right: Expression)
  extends BinaryExpression {

  // Inputs must already be ARRAY<BIGINT> (callers cast explicitly);
  // AbstractDataType/ExpectsInputTypes are private[sql] in Spark 4, so
  // input validation happens at the call sites instead.
  override def dataType: DataType = LongType

  override def prettyName: String = "graft_sqdist_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val d = x.getLong(i) - y.getLong(i)
        s += d * d
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $s += $d * $d;
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArraySqDistLong =
    copy(left = newLeft, right = newRight)
}
