package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-per-group "current pointer" promotion (operator O15 of SURVEY
  * §2.1).
  *
  * The reference promotes the newest unique object of each dataset to a
  * canonical `<dataset>/current/<name>` key
  * (`/root/reference/download/common.go:115-122`, `file/api.go:81-87`) and
  * repairs it in batch by taking the lexicographic tail of a listing
  * (`UpdateCurrent.sh:5-10`).
  *
  * Two formulations:
  *  - [[latest]] — `max_by` aggregation. Partial-aggregable (map-side
  *    combine), a single shuffle, no per-group sort: the right plan at
  *    100 TB where groups are numerous and rows per group are large.
  *  - [[latestWindow]] — `row_number` window, kept for callers that need
  *    the rest of the row's columns without re-projection or need top-k
  *    (k > 1).
  */
object CurrentPointer {
  /** Latest row per group: for each `groupCols`, the `payload` struct of
    * the row maximizing `orderCols` lexicographically (include a unique
    * tiebreaker as the last order column for determinism).
    */
  def latest(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
             payload: Column): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(max_by(payload, struct(orderCols: _*)).as("latest"))

  /** Window formulation: all original columns of the top row per group. */
  def latestWindow(df: DataFrame, groupCols: Seq[Column],
                   orderDesc: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(orderDesc.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** BATCH current-pointer REPAIR — the crash-recovery tool the
    * reference ships as a standalone script
    * (`/root/reference/UpdateCurrent.sh:5-10`: `gsutil ls <prefix>…
    * *<suffix> | tail -n 1` → `gsutil cp <latest> …/current/<name>`):
    * re-derive the canonical `current` key from the store LISTING
    * alone, for when a crash left it stale or missing.
    *
    * Semantics mirrored exactly: candidates are the objects under
    * `prefix` whose name ends with `suffix` (the shell glob's
    * `*<suffix>` match), excluding anything under a `current/` segment
    * (the reference's year-scoped glob can never match its own
    * pointer; a prefix-rooted listing can); the promoted object is the
    * LEXICOGRAPHIC tail — which the `YYYY/MM[/DD]` + timestamped key
    * layout ([[graft.sources.Naming]]) makes chronological — and the
    * promotion is a server-side copy (O19), never a re-download.
    *
    * Idempotent. Returns the promoted source key, or None when no
    * candidate exists — an empty listing leaves the pointer UNTOUCHED
    * rather than deleting the only remaining copy. */
  def repair(store: graft.sources.Store, prefix: String, suffix: String,
             currentName: String): Option[String] = {
    val latest = store.list(prefix)
      .map(_.name)
      .filter(n => n.endsWith(suffix) && n != currentName &&
        !n.contains("/current/"))
      .sorted.lastOption
    latest.foreach(store.copy(_, currentName))
    latest
  }
}
