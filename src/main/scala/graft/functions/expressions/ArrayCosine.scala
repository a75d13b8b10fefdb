package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine similarity of two ARRAY<DOUBLE> columns in ONE codegen'd pass.
  * Exactly replicates the composed `ArrayDot(a,b) / (sqrt(ArrayDot(a,a))
  * * sqrt(ArrayDot(b,b)))` — including on ragged or null-element inputs:
  * the cross sum runs over the common prefix (both elements non-null),
  * while EACH norm runs over its own array's full length (its non-null
  * elements), each accumulator in index order. Identical IEEE operations
  * ⇒ bit-identical results, at a third of the traversals.
  *
  * Zero-norm edge: this form divides in raw Java (NaN), while the
  * composed form under ANSI mode raises DIVIDE_BY_ZERO — callers must
  * guarantee nonzero vectors (all similarity queries here do).
  */
case class ArrayCosine(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    val n = math.max(nx, ny)
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val xOk = i < nx && !x.isNullAt(i)
      val yOk = i < ny && !y.isNullAt(i)
      if (xOk) { val v = x.getDouble(i); aa += v * v }
      if (yOk) { val v = y.getDouble(i); bb += v * v }
      if (xOk && yOk) ab += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xOk = ctx.freshName("xOk")
      val yOk = ctx.freshName("yOk")
      val v = ctx.freshName("v")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $n = java.lang.Math.max($nx, $ny);
         |double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  boolean $xOk = $i < $nx && !$a.isNullAt($i);
         |  boolean $yOk = $i < $ny && !$b.isNullAt($i);
         |  if ($xOk) { double $v = $a.getDouble($i); $aa += $v * $v; }
         |  if ($yOk) { double $v = $b.getDouble($i); $bb += $v * $v; }
         |  if ($xOk && $yOk) { $ab += $a.getDouble($i) * $b.getDouble($i); }
         |}
         |${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCosine =
    copy(left = newLeft, right = newRight)
}
