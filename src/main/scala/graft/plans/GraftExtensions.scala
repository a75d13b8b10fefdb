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
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(a, b) takes two array<double> args")
        ArrayDot(args.head, args(1))
      }))
    ext.injectOptimizerRule(_ => RewriteLatestPerGroup)
    ext.injectPlannerStrategy(_ => SimilarityStrategy)
  }
}
