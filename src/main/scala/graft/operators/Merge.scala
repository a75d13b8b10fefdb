package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Keyed MERGE (SCD-1 upsert): rows from `updates` replace base rows with
  * the same key; unmatched updates insert; untouched base rows carry
  * through. The reference's current-pointer promotion
  * (/root/reference/download/common.go:115-122 — newest file overwrites
  * the `current/` key) is the degenerate one-key form; this is the row-
  * keyed generalization every archive/lakehouse table needs.
  *
  * Decomposition: `updates ∪ (base ⟵anti⟶ updates)` — one left-anti
  * equi-join on the key. At 100 TB the update batch is the small side, so
  * Catalyst broadcasts it and the base table streams through one scan
  * with NO shuffle of base data; with base bucketed/partitioned by key
  * the anti-join co-locates instead. This beats read-modify-write per key
  * (driver-side) and full-outer-join forms (which shuffle both sides).
  */
object Merge {
  /** Upsert as a dataflow. `updates` must be key-unique (pre-reduce a
    * versioned feed with latest-per-key — [[CurrentPointer]] — first);
    * duplicate update keys would both survive, faithfully but uselessly.
    * Schemas must match column-for-column (order-insensitive). */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    require(base.columns.sorted.sameElements(updates.columns.sorted),
      s"schema mismatch: base [${base.columns.sorted.mkString(",")}] vs " +
        s"updates [${updates.columns.sorted.mkString(",")}]")
    updates.unionByName(
      base.join(updates.select(keys.map(col): _*), keys, "left_anti"))
  }

  /** Upsert into a stored flat parquet table via the shared crash-safe
    * two-rename swap ([[graft.core.Sinks.atomicSwap]]: writers quiesced;
    * dot-prefixed tmp/backup siblings invisible to partition discovery;
    * a backup stranded mid-swap is restored on the next call; tmp debris
    * cleaned up). A missing table is CREATED from the update batch —
    * via the same write-tmp-then-rename, so a crash mid-create never
    * leaves a half-written directory at `path` that would wedge every
    * replay. Together with the restore, a streaming caller replaying an
    * uncommitted batch always re-asserts the same rows against the same
    * base: effectively-once table state from an at-least-once sink. */
  def upsertInto(spark: SparkSession, path: String, updates: DataFrame,
                 keys: Seq[String]): Unit = {
    graft.core.Sinks.recoverStrandedBackup(path)
    val exists = new java.io.File(path).isDirectory
    graft.core.Sinks.atomicSwap(path, "merge") { tmp =>
      val merged =
        if (exists) upsert(spark.read.parquet(path), updates, keys)
        else updates
      merged.write.mode("overwrite").parquet(tmp)
    }
  }
}
