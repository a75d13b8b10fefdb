package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations for a training-data pipeline: declarative
  * row-level rules audited in ONE scan (conditional aggregation — no
  * per-rule passes), plus referential checks as anti-joins.
  *
  * The reference's analog is its drop-with-metric row validation
  * (/root/reference/download/routeviews.go:101-106) generalized: instead
  * of one hard-wired parse check, any predicate becomes a named counter.
  * Scale: the audit is a single partial-aggregable scan regardless of
  * rule count; referential checks broadcast the (usually dimension-
  * sized) parent key set.
  */
object Expectations {

  /** A named row-level rule: a violation is a row where `holds` is false
    * (nulls count as violations — an unknown value doesn't satisfy). */
  case class Rule(name: String, holds: Column)

  /** Audit all rules in one scan: (rule STRING, violations BIGINT,
    * total BIGINT), one row per rule. */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    // duplicate names would silently merge (or abort, under the default
    // mapKeyDedupPolicy=EXCEPTION) in the map-explode below — reject them
    // while the caller's stack still points at the rule list
    val dups = rules.groupBy(_.name).collect { case (n, rs) if rs.size > 1 => n }
    require(dups.isEmpty, s"duplicate rule names: ${dups.mkString(", ")}")
    // internal positional aliases: rule names are user strings and must
    // not round-trip through col() (dots/duplicates/reserved names would
    // break resolution); coalesce so an EMPTY input reports 0 violations
    // per rule, not NULL (sum over zero rows is NULL, and NULL would
    // slip through a `violations > 0` quality gate)
    val counters = rules.zipWithIndex.map { case (r, i) =>
      coalesce(sum(when(coalesce(r.holds, lit(false)), 0L).otherwise(1L)), lit(0L))
        .as(s"__r$i")
    }
    val agg = df.agg(count(lit(1)).as("__exp_total"), counters: _*)
    val pairs = rules.zipWithIndex.flatMap { case (r, i) =>
      Seq(lit(r.name), col(s"__r$i"))
    }
    agg.select(explode(map(pairs: _*)).as(Seq("rule", "violations")),
        col("__exp_total").as("total"))
      .select(col("rule"), col("violations").cast("long"), col("total"))
  }

  /** Referential-integrity violations: child rows whose `fk` has no
    * match in parent's `pk` (null fks excluded — use a Rule for null
    * checks). No broadcast hint: Catalyst broadcasts dimension-sized
    * parents on its own, and a fact-sized parent (q48 checks lineitem
    * against orders) must stay a shuffle join at scale. */
  def danglingForeignKeys(child: DataFrame, fk: Column,
                          parent: DataFrame, pk: Column): DataFrame = {
    val pkeys = parent.select(pk.as("__pk")).distinct()
    // reference the parent frame's column directly — an unqualified
    // col("__pk") would be ambiguous if the child also carries one
    child.filter(fk.isNotNull)
      .join(pkeys, fk === pkeys("__pk"), "left_anti")
  }
}
