package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-hash deduplication (operators O11–O14 of SURVEY §2.1).
  *
  * The reference's `IsFileNew` (`/root/reference/download/common.go:162-190`)
  * declares a file a duplicate iff some *other* name in its dedup scope has
  * an equal MD5 (self-match excluded, missing hash ⇒ conservatively new).
  * `DedupRegexp` group 1 of the filename defines the scope
  * (`download/maxmind.go:13`, `download/routeviews.go:19`).
  *
  * Scale notes: the reference re-lists a whole bucket per check
  * (`file/api.go:53` — a known spec/impl mismatch; we implement the spec'd
  * prefix-scoped semantics). Here dedup is one hash-partitioned shuffle on
  * (scope, hash) with map-side partial aggregation — no O(catalog) rescans,
  * no self-join double shuffle. At 100 TB the hash is computed once at
  * ingest and carried as a column, so dedup never re-reads payloads.
  */
object HashDedup {
  /** Rows whose hash is shared with no *other* id in its scope (exact
    * `IsFileNew` semantics, vectorized over all rows at once).
    *
    * Missing (null) hash ⇒ kept, mirroring `common.go:171-174`.
    * Implemented with a count-over-hash window: a single shuffle on the
    * hash key, versus two for the equivalent self-anti-join.
    */
  def uniques(df: DataFrame, hashCol: Column, scopeCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(scopeCols :+ hashCol: _*)
    df.withColumn("__dup_n", count(lit(1)).over(w))
      .filter(hashCol.isNull || col("__dup_n") === 1)
      .drop("__dup_n")
  }

  /** Self-anti-join formulation of [[uniques]] — the literal translation of
    * the reference's probe (`md5 equal AND name different`). Kept for the
    * broadcast case: when the scope catalog is small, Catalyst broadcasts
    * the build side and the probe is shuffle-free.
    */
  def uniquesAntiJoin(df: DataFrame, hashName: String, idName: String): DataFrame = {
    val other = df.select(col(hashName).as("__h"), col(idName).as("__id"))
    df.join(other,
      col(hashName) === col("__h") && col(idName) =!= col("__id"),
      "left_anti")
  }

  /** Within-scope dedup keeping the smallest id per (scope, hash) — the
    * "first upload wins, later duplicates deleted" policy
    * (`/root/reference/download/common.go:113-130`) expressed as an
    * aggregation (partial-agg friendly; no window sort).
    *
    * Missing (null) hash ⇒ every such row kept individually (the
    * conservative rule of `common.go:171-174`, same as [[uniques]]) —
    * a plain groupBy would collapse all null-hash rows into one group.
    */
  def keepFirst(df: DataFrame, scopeCols: Seq[Column], hashCol: Column,
                idCol: Column): DataFrame = {
    val hashed = df.filter(hashCol.isNotNull)
      .groupBy(scopeCols :+ hashCol.as("hash"): _*)
      .agg(min(idCol).as("keep_id"))
    val unhashed = df.filter(hashCol.isNull)
      .select(scopeCols :+ hashCol.as("hash") :+ idCol.as("keep_id"): _*)
    hashed.unionByName(unhashed)
  }

  /** Dedup-scope derivation: regex group 1 of the object name
    * (`/root/reference/download/common.go:114`). */
  def scopeOf(nameCol: Column, scopeRegex: String): Column =
    regexp_extract(nameCol, scopeRegex, 1)
}
