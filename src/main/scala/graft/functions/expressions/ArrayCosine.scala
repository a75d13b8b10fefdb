package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine similarity of two ARRAY<DOUBLE> columns in ONE codegen'd pass:
  * the three sequential sums (⟨a,b⟩, ⟨a,a⟩, ⟨b,b⟩) accumulate in a single
  * loop, then combine as `dot / (sqrt(na) * sqrt(nb))` — the identical
  * IEEE operations the composed form and the DuckDB oracle perform, at a
  * third of the array traversals. Null semantics match [[ArrayDot]]
  * (null input ⇒ null; null elements contribute nothing).
  */
case class ArrayCosine(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = x.getDouble(i); val yv = y.getDouble(i)
        ab += xv * yv; aa += xv * xv; bb += yv * yv
      }
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $xv = $a.getDouble($i);
         |    double $yv = $b.getDouble($i);
         |    $ab += $xv * $yv; $aa += $xv * $xv; $bb += $yv * $yv;
         |  }
         |}
         |${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCosine =
    copy(left = newLeft, right = newRight)
}
