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

  /** Compact a parquet directory to at most ~`targetMb` output files:
    * the small-files remedy for an incrementally-appended archive (every
    * streaming micro-batch adds files; scans degrade as the file count
    * grows). Returns the new file count.
    *
    * CONTRACT — plain-parquet compaction is not transactional:
    *  - the WRITER must be quiesced (pause the streaming query) — files
    *    appended after the snapshot read would be lost in the swap;
    *  - READERS may hit a brief window during the two renames where the
    *    path is absent (a crash there leaves the data at
    *    `<path>.compact_old` for manual recovery). A table format
    *    (Delta/Iceberg-style) is the fix when either constraint bites;
    *    a stale `.compact_old`/`.compact_tmp` from a crashed run is
    *    cleaned up on the next call.
    */
  def compact(spark: SparkSession, path: String, targetMb: Int = 128): Int = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Paths.get(path)
    // a flat rewrite of a hive-partitioned root would fold the partition
    // directories into plain columns and destroy pruning — compact each
    // partition directory individually instead
    val partitioned = Option(dir.toFile.listFiles())
      .exists(_.exists(f => f.isDirectory && f.getName.contains("=")))
    require(!partitioned,
      s"$path is hive-partitioned; compact each partition directory, not the root")
    // dot-prefixed siblings: Spark's file listing ignores dot-paths, so
    // a crash mid-swap can NOT pollute partition discovery of the parent
    // table (a bare "day=2.compact_old" would parse as a bogus partition)
    val base = dir.getFileName.toString
    val tmp = dir.resolveSibling(s".$base.compact_tmp").toString
    val bak = dir.resolveSibling(s".$base.compact_old").toString
    // recover from a previously crashed run
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(bak))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    val bytes = Files.walk(dir)
    val totalBytes =
      try bytes.filter(Files.isRegularFile(_))
        .mapToLong(f => Files.size(f)).sum()
      finally bytes.close()
    val targetBytes = targetMb * 1024L * 1024L
    // ceiling division: files stay AT OR BELOW ~targetMb
    val nFiles = math.max(1, ((totalBytes + targetBytes - 1) / targetBytes).toInt)
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp)
    Files.move(dir, Paths.get(bak), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), dir, StandardCopyOption.ATOMIC_MOVE)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(bak))
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
