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

  /** Upsert into a stored flat parquet table with the same crash-safe
    * two-rename swap discipline as [[graft.core.Sinks.compact]] (writers
    * quiesced; dot-prefixed tmp/backup siblings so partition discovery
    * of a parent never sees debris; stale debris from a crashed run is
    * cleaned up on the next call). Returns the new row count. */
  def upsertInto(spark: SparkSession, path: String, updates: DataFrame,
                 keys: Seq[String]): Long = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Paths.get(path)
    require(dir.toFile.isDirectory, s"$path does not exist")
    val base = dir.getFileName.toString
    val tmp = dir.resolveSibling(s".$base.merge_tmp").toString
    val bak = dir.resolveSibling(s".$base.merge_old").toString
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(bak))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    upsert(spark.read.parquet(path), updates, keys)
      .write.mode("overwrite").parquet(tmp)
    Files.move(dir, Paths.get(bak), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), dir, StandardCopyOption.ATOMIC_MOVE)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(bak))
    spark.read.parquet(path).count()
  }
}
