package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{ArrayCosine, ArrayDot, ArraySqDistLong, CdcChunkHashes, EditDistanceIs1, WinnowFingerprints, WordShingles}

/** Engine extensions, installable via
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`:
  *
  *  - SQL functions over the native kernels — `graft_dot(a, b)`,
  *    `graft_cosine(a, b)`, `graft_shingles(text, n)`,
  *    `graft_edit1(a, b)` — so `spark.sql` users reach the same
  *    codegen'd hot paths as the DataFrame surface
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

  /** `graft_cosine(a, b)`: [[ArrayCosine]] with the same defensive cast
    * as [[dotBuilder]]. */
  val cosineBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "graft_cosine(a, b) takes two array<double> args")
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    ArrayCosine(Cast(args.head, ArrayType(DoubleType)),
                Cast(args(1), ArrayType(DoubleType)))
  }

  /** `graft_shingles(text, n)`: distinct word n-gram shingles through
    * the fused [[WordShingles]] kernel. `n` must be an integer LITERAL —
    * the shingle width shapes the plan (it is a construction parameter,
    * not data), exactly like the DataFrame surface's `shingleN`. */
  val shinglesBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "graft_shingles(text, n) takes (string, int literal)")
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.IntegerType
    val n = args(1) match {
      case Literal(v: Int, IntegerType) if v > 0 => v
      case other => throw new IllegalArgumentException(
        s"graft_shingles n must be a positive int literal, got $other")
    }
    WordShingles(args.head, n)
  }

  /** `graft_edit1(a, b)`: true iff levenshtein(a, b) == 1, via the
    * two-pointer [[EditDistanceIs1]] kernel (no DP matrix). */
  val edit1Builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "graft_edit1(a, b) takes two string args")
    EditDistanceIs1(args.head, args(1))
  }

  /** `graft_sqdist_long(a, b)`: exact integer Σ(aᵢ−bᵢ)² through
    * [[ArraySqDistLong]], with the [[dotBuilder]] defensive cast so SQL
    * callers with int arrays get correct widening. */
  val sqDistBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "graft_sqdist_long(a, b) takes two array<bigint> args")
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, LongType}
    ArraySqDistLong(Cast(args.head, ArrayType(LongType)),
                    Cast(args(1), ArrayType(LongType)))
  }

  /** `graft_cdc_chunks(text, w)`: content-defined chunk md5s through
    * the fused [[CdcChunkHashes]] kernel; `w` is an int literal like
    * [[shinglesBuilder]]'s n (a construction parameter). */
  val cdcBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "graft_cdc_chunks(text, w) takes (string, int literal)")
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.IntegerType
    val w = args(1) match {
      case Literal(v: Int, IntegerType) if v > 0 => v
      case other => throw new IllegalArgumentException(
        s"graft_cdc_chunks w must be a positive int literal, got $other")
    }
    CdcChunkHashes(args.head, w)
  }

  /** `graft_winnow(text, n, w)`: positional winnowing fingerprints
    * (distinct w-window minima over char n-gram md5s) through the fused
    * [[WinnowFingerprints]] kernel; `n` and `w` are int literals like
    * [[shinglesBuilder]]'s n (construction parameters). */
  val winnowBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 3, "graft_winnow(text, n, w) takes (string, int literal, int literal)")
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.IntegerType
    def intLit(e: Expression, name: String): Int = e match {
      case Literal(v: Int, IntegerType) if v > 0 => v
      case other => throw new IllegalArgumentException(
        s"graft_winnow $name must be a positive int literal, got $other")
    }
    WinnowFingerprints(args.head, intLit(args(1), "n"), intLit(args(2), "w"))
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
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[ArrayCosine].getName, "graft_cosine"),
      GraftExtensions.cosineBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      GraftExtensions.shinglesBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_edit1"),
      new ExpressionInfo(classOf[EditDistanceIs1].getName, "graft_edit1"),
      GraftExtensions.edit1Builder))
    ext.injectFunction((
      FunctionIdentifier("graft_sqdist_long"),
      new ExpressionInfo(classOf[ArraySqDistLong].getName, "graft_sqdist_long"),
      GraftExtensions.sqDistBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunkHashes].getName, "graft_cdc_chunks"),
      GraftExtensions.cdcBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow"),
      GraftExtensions.winnowBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_redact_pii"),
      new ExpressionInfo(classOf[Expression].getName, "graft_redact_pii"),
      GraftExtensions.redactBuilder))
    ext.injectOptimizerRule(_ => RewriteLatestPerGroup)
    ext.injectPlannerStrategy(_ => SimilarityStrategy)
  }
}
