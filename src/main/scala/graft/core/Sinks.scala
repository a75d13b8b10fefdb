package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned archive sinks: the reference's date-partitioned key layout
  * (`Maxmind/YYYY/MM/DD/...`, /root/reference/downloader.go:64,
  * download/common.go:95-101) as *real* partition columns instead of
  * path-string conventions — so partition pruning replaces prefix
  * listing, and the timezone is UTC by construction (the reference mixes
  * local-time directories with UTC file prefixes).
  */
object Sinks {

  /** Write `df` date-partitioned by the UTC (year, month, day) of
    * `tsCol`. Readers filtering on the partition columns scan only the
    * matching directories (partition pruning — the fixed version of the
    * reference's dedup-scope listing). */
  def writeDatePartitioned(df: DataFrame, tsCol: Column, path: String,
                           mode: String = "overwrite"): Unit =
    df.withColumn("year", year(tsCol).cast("int"))
      .withColumn("month", month(tsCol).cast("int"))
      .withColumn("day", dayofmonth(tsCol).cast("int"))
      .write.mode(mode)
      .partitionBy("year", "month", "day")
      .parquet(path)

  /** Read a date-partitioned archive; `year/month/day` come back as
    * partition columns usable for pruning. */
  def readDatePartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Crash-safe replace of directory `path`: `write` produces the new
    * content at a dot-prefixed tmp sibling, then two ATOMIC_MOVEs swap it
    * in (`path` → `.«base».«tag»_old` → delete). Shared by [[compact]]
    * and [[graft.operators.Merge.upsertInto]] so the swap discipline has
    * exactly one implementation.
    *
    * Recovery: a crash BETWEEN the two renames leaves the content at the
    * backup sibling and `path` absent — the next call (any tag) restores
    * the backup before proceeding, so the window self-heals instead of
    * silently presenting as "no table" (dot-prefixed siblings are
    * invisible to Spark's file listing either way). A crash during
    * `write` leaves only tmp debris, deleted up front on the next call.
    * `path` absent with no backup = first write: the tmp content moves
    * straight in (no backup step), so a partial first write can never
    * leave a half-created directory at `path` itself. */
  def atomicSwap(path: String, tag: String)(write: String => Unit): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // an unregistered tag would strand a backup that recovery (which
    // scans SwapTags) can never restore — one crash + retry would then
    // DELETE the only copy as debris; fail at the call site instead
    require(SwapTags.contains(tag),
      s"unregistered swap tag '$tag' — add it to Sinks.SwapTags so " +
        "crash recovery can restore its backups")
    val dir = Paths.get(path)
    val base = dir.getFileName.toString
    val tmp = dir.resolveSibling(s".$base.${tag}_tmp")
    recoverStrandedBackup(path)
    // with `path` live (pre-existing or just restored), EVERY remaining
    // backup — any tag — is stale debris from an interrupted cleanup;
    // deleting only this tag's would let a later cross-tag recovery
    // restore a stale snapshot over rows written since (e.g. a stale
    // compact_old rolling back a merge table)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    allBackups(path).foreach(b =>
      org.apache.commons.io.FileUtils.deleteDirectory(b.toFile))
    write(tmp.toString)
    val bak = dir.resolveSibling(s".$base.${tag}_old")
    if (Files.exists(dir)) {
      Files.move(dir, bak, StandardCopyOption.ATOMIC_MOVE)
      Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
      org.apache.commons.io.FileUtils.deleteDirectory(bak.toFile)
    } else {
      Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** Every tag that participates in [[atomicSwap]] — recovery must be
    * able to restore a backup stranded by ANY caller. */
  private val SwapTags =
    Seq("compact", "merge", "sketch", "orphans", "merkle", "srm")

  private def allBackups(path: String): Seq[java.nio.file.Path] = {
    val dir = java.nio.file.Paths.get(path)
    val base = dir.getFileName.toString
    SwapTags.map(t => dir.resolveSibling(s".$base.${t}_old"))
      .filter(java.nio.file.Files.exists(_))
  }

  /** If `path` is absent but a swap backup sibling exists (a crash hit
    * the window between [[atomicSwap]]'s two renames), restore the
    * NEWEST one — when several tags left backups, only the most recent
    * holds the pre-crash table; older ones are stale snapshots. Called
    * by atomicSwap itself; also callable up front by operations whose
    * preconditions inspect `path` before swapping. */
  def recoverStrandedBackup(path: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Paths.get(path)
    if (!Files.exists(dir)) {
      allBackups(path)
        .sortBy(b => Files.getLastModifiedTime(b).toMillis)
        .lastOption
        .foreach(b => Files.move(b, dir, StandardCopyOption.ATOMIC_MOVE))
    }
  }

  /** Compact a parquet directory to at most ~`targetMb` output files:
    * the small-files remedy for an incrementally-appended archive (every
    * streaming micro-batch adds files; scans degrade as the file count
    * grows). Returns the new file count.
    *
    * CONTRACT — plain-parquet compaction is not transactional:
    *  - the WRITER must be quiesced (pause the streaming query) — files
    *    appended after the snapshot read would be lost in the swap;
    *  - READERS may hit a brief window during the two renames where the
    *    path is absent (a crash there leaves the data at the hidden
    *    backup sibling, RESTORED automatically by the next swap-family
    *    call — see [[atomicSwap]]). A table format (Delta/Iceberg-style)
    *    is the fix when either constraint bites; stale tmp debris from a
    *    crashed run is cleaned up on the next call.
    */
  def compact(spark: SparkSession, path: String, targetMb: Int = 128): Int = {
    import java.nio.file.Files
    recoverStrandedBackup(path)
    val dir = java.nio.file.Paths.get(path)
    // a flat rewrite of a hive-partitioned root would fold the partition
    // directories into plain columns and destroy pruning — compact each
    // partition directory individually instead
    val partitioned = Option(dir.toFile.listFiles())
      .exists(_.exists(f => f.isDirectory && f.getName.contains("=")))
    require(!partitioned,
      s"$path is hive-partitioned; compact each partition directory, not the root")
    val bytes = Files.walk(dir)
    val totalBytes =
      try bytes.filter(Files.isRegularFile(_))
        .mapToLong(f => Files.size(f)).sum()
      finally bytes.close()
    val targetBytes = targetMb * 1024L * 1024L
    // ceiling division: files stay AT OR BELOW ~targetMb
    val nFiles = math.max(1, ((totalBytes + targetBytes - 1) / targetBytes).toInt)
    // dot-prefixed swap siblings: Spark's file listing ignores dot-paths,
    // so a crash mid-swap can NOT pollute partition discovery of the
    // parent table (a bare "day=2.compact_old" would parse as a bogus
    // partition)
    atomicSwap(path, "compact") { tmp =>
      spark.read.parquet(path).repartition(nFiles)
        .write.mode("overwrite").parquet(tmp)
    }
    nFiles
  }

  /** Compact every leaf partition directory of a hive-partitioned table
    * (recursing through `k=v` levels), one [[compact]] per leaf — each
    * partition swaps independently, so a failure confines itself to one
    * partition. Returns (partitions compacted, total output files).
    */
  def compactPartitioned(spark: SparkSession, root: String,
                         targetMb: Int = 128): (Int, Int) = {
    val rootFile = new java.io.File(root)
    require(rootFile.isDirectory, s"$root does not exist or is not a directory")
    def leaves(dir: java.io.File): Seq[java.io.File] = {
      val subParts = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.contains("=") &&
          !f.getName.startsWith("."))
      if (subParts.isEmpty) Seq(dir) else subParts.toSeq.flatMap(leaves)
    }
    val parts = leaves(rootFile)
      .filterNot(_.getCanonicalPath == rootFile.getCanonicalPath)
    require(parts.nonEmpty,
      s"$root has no k=v partition directories — use compact() for flat tables")
    val files = parts.map(p => compact(spark, p.getPath, targetMb)).sum
    (parts.size, files)
  }
}
