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
    val counters = rules.map(r =>
      sum(when(coalesce(r.holds, lit(false)), 0L).otherwise(1L)).as(r.name))
    val agg = df.agg(count(lit(1)).as("__total"), counters: _*)
    // unpivot to one row per rule
    val pairs = rules.flatMap(r => Seq(lit(r.name), col(r.name)))
    agg.select(explode(map(pairs: _*)).as(Seq("rule", "violations")),
        col("__total").as("total"))
      .select(col("rule"), col("violations").cast("long"), col("total"))
  }

  /** Referential-integrity violations: child rows whose `fk` has no
    * match in parent's `pk` (null fks excluded — use a Rule for
    * null checks). */
  def danglingForeignKeys(child: DataFrame, fk: Column,
                          parent: DataFrame, pk: Column): DataFrame =
    child.filter(fk.isNotNull)
      .join(broadcast(parent.select(pk.as("__pk")).distinct()),
        fk === col("__pk"), "left_anti")
}
