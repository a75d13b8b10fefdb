package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode–Muthukrishnan) over a string-castable item
  * column: d independent hash rows × 256 buckets (bucket = first 2 md5
  * hex digits keyed by the row index), estimate(x) = min over rows of
  * x's bucket count. One-sided (est ≥ true, always); cells are exact
  * integer counts, so two sketches over disjoint data MERGE by
  * cellwise ADDITION — the mergeable-summaries property that makes the
  * sketch partial-aggregable within a job, shardable across a fleet,
  * and maintainable incrementally by a stream
  * ([[graft.streaming.EventStream.startCountMinMonitor]] — merge there
  * is bit-equal to a batch rebuild because integer addition is
  * associative and commutative, spec-pinned).
  *
  * Everything is DETERMINISTIC on md5 — no seeds — which is how q130's
  * whole estimator replays in DuckDB as an oracle-exact compare where
  * classic randomized sketches are rows-only (q47/q71/q79).
  *
  * Shared by q130 (batch heavy hitters) and the streaming monitor, so
  * the two provably agree on hash row keys and bucket layout.
  */
object CountMin {

  /** Bucket of item `x` in hash row `j`: first 2 hex digits of
    * md5(j || "|" || x) — 256 buckets, engine-portable (the hex string
    * itself is the bucket key; no numeric parse to disagree on). */
  def bucket(j: Column, x: Column): Column =
    substring(md5(concat(j.cast("string"), lit("|"), x.cast("string"))), 1, 2)

  /** Sketch cells for `df[itemCol]`: one scan exploded ×d into slim
    * (j, b) pairs folded by a partial-aggregable count into ≤ d×256
    * rows (j, b, c). Map-side combine does the heavy lifting; the
    * shuffle carries at most d×256 rows per partition. */
  def cells(df: DataFrame, itemCol: String, d: Int = 4): DataFrame = {
    val rows = typedLit((0 until d).toList)
    df.select(col(itemCol).as("__x"), explode(rows).as("j"))
      .select(col("j"), bucket(col("j"), col("__x")).as("b"))
      .groupBy(col("j"), col("b")).agg(count(lit(1)).as("c"))
  }

  /** Cellwise ADD of two cell relations — the CMS merge. Exact integer
    * addition: merging per-batch sketches in any order or grouping
    * yields the identical cells as one build over the union. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("j"), col("b")).agg(sum(col("c")).as("c"))

  /** Point estimates for `candidates[itemCol]` against a (broadcast)
    * cell relation: explode ×d, join on (j, bucket), min over rows.
    * The join is LEFT — a candidate hashing into a never-touched
    * bucket has cell count 0, and an inner join would silently drop
    * it instead of reporting the correct estimate of 0 (matters for
    * store-served probes of unseen items; items present in the
    * sketched data always find all d cells). Keeps every candidate
    * column; adds `est_cnt`. The probe-side working columns use a
    * reserved `__cms_` prefix so a candidates relation that itself
    * carries `j`/`b`/`c` columns (entirely plausible user schema)
    * cannot be silently overwritten into a wrong join; `est_cnt` and
    * the reserved prefix are asserted absent because they name the
    * output. */
  def estimates(candidates: DataFrame, sketch: DataFrame, itemCol: String,
                d: Int = 4): DataFrame = {
    val reserved = candidates.columns
      .filter(c => c == "est_cnt" || c.startsWith("__cms_"))
    require(reserved.isEmpty,
      s"candidates must not carry reserved columns: ${reserved.mkString(", ")}")
    val rows = typedLit((0 until d).toList)
    val keys = candidates.columns.map(col).toSeq
    val sk = sketch.select(col("j").as("__cms_j"), col("b").as("__cms_b"),
      col("c").as("__cms_c"))
    candidates
      .withColumn("__cms_j", explode(rows))
      .withColumn("__cms_b", bucket(col("__cms_j"), col(itemCol)))
      .join(broadcast(sk), Seq("__cms_j", "__cms_b"), "left")
      .groupBy(keys: _*)
      .agg(min(coalesce(col("__cms_c"), lit(0L))).as("est_cnt"))
  }
}
