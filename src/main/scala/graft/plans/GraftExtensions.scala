package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.ArrayDot

/** Engine extensions, installable via
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`:
  *
  *  - `graft_dot(a, b)` SQL function → [[ArrayDot]] (native codegen dot
  *    product)
  *  - [[RewriteLatestPerGroup]] optimizer rule (window → max_by)
  */
object GraftExtensions {
  /** The graft_dot SQL builder. ArrayDot assumes ARRAY<DOUBLE> input;
    * casting here gives SQL callers with int/float arrays correct
    * results instead of a runtime ClassCastException (or silent garbage
    * under codegen). */
  val dotBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "graft_dot(a, b) takes two array<double> args")
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    ArrayDot(Cast(args.head, ArrayType(DoubleType)),
             Cast(args(1), ArrayType(DoubleType)))
  }

  /** `graft_redact_pii(text)` SQL builder: the [[graft.functions.TextOps
    * .redactPii]] chain as a direct Catalyst `RegExpReplace` tree (the
    * Column-API shim wraps args in an unevaluable ColumnNode under
    * Spark 4's function injection, so the tree is built from the SAME
    * [[graft.functions.TextOps.PiiPatterns]] source of truth instead —
    * codegen'd, no UDF, identical patterns to the DataFrame surface). */
  val redactBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "graft_redact_pii(text) takes one string arg")
    import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace}
    graft.functions.TextOps.PiiPatterns.foldLeft(args.head) { case (e, (tag, re)) =>
      RegExpReplace(e, Literal(re), Literal(s"[${tag.toUpperCase}]"))
    }
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot"),
      GraftExtensions.dotBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_redact_pii"),
      new ExpressionInfo(classOf[Expression].getName, "graft_redact_pii"),
      GraftExtensions.redactBuilder))
    ext.injectOptimizerRule(_ => RewriteLatestPerGroup)
    ext.injectPlannerStrategy(_ => SimilarityStrategy)
  }
}
