package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * with NO shuffle of base data.
  *
  * The STORED form ([[upsertInto]]) goes further: the table is laid out
  * hash-bucketed by key (`gbucket=N` partition directories, N =
  * pmod(xxhash64(keys), nBuckets)), so a batch only ever reads and
  * rewrites the buckets its keys hash into — per-batch I/O is
  * O(batch-touched buckets), not O(table). That is the reference's
  * O(1)-per-update current-pointer copy (/root/reference/file/api.go:81-87)
  * generalized to row keys: at 100 TB with 4096 buckets, a trigger
  * touching 10 buckets rewrites ~250 GB, not 100 TB.
  */
object Merge {
  /** Partition column carrying the key-hash bucket in the stored layout.
    * Deliberately NOT dot/underscore-prefixed (Spark's file listing would
    * hide the directories); collisions with user columns are rejected. */
  val BucketCol = "gbucket"

  /** Table-root metadata sidecar. Underscore prefix keeps it out of
    * Spark's file listing (same convention as `_SUCCESS`). */
  private val MetaFile = "_graft_merge.meta"

  /** Deterministic bucket of a key tuple. xxhash64 is stable across runs
    * and partitionings, so a key's bucket never moves for the lifetime of
    * the table (nBuckets is pinned in the table's meta sidecar). */
  private def bucketExpr(keys: Seq[String], n: Int): Column =
    pmod(xxhash64(keys.map(col): _*), lit(n.toLong)).cast("int")

  /** Upsert as a dataflow. `updates` must be key-unique (pre-reduce a
    * versioned feed with latest-per-key — [[CurrentPointer]] — first);
    * duplicate update keys would both survive, faithfully but uselessly.
    * Schemas must match column-for-column in name AND type
    * (order-insensitive): a drifted dtype (int vs long) would otherwise
    * pass a name-only check and surface later as a union widen/failure. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val bCols = base.schema.map(f => f.name -> f.dataType).sortBy(_._1)
    val uCols = updates.schema.map(f => f.name -> f.dataType).sortBy(_._1)
    require(bCols == uCols,
      s"schema mismatch: base [${bCols.map(c => s"${c._1}:${c._2.simpleString}").mkString(",")}] vs " +
        s"updates [${uCols.map(c => s"${c._1}:${c._2.simpleString}").mkString(",")}]")
    updates.unionByName(
      base.join(updates.select(keys.map(col): _*), keys, "left_anti"))
  }

  /** Drop update rows that are OLDER than what the table already holds:
    * keep a row only when the base has no row for its key, or the
    * update's `versionCols` tuple strictly exceeds the stored one
    * (struct comparison = lexicographic on the tuple). This is what
    * makes an out-of-order update arriving in a LATER micro-batch unable
    * to overwrite a newer stored row — within-batch ordering alone
    * (a window reduce) can't see across batch boundaries.
    *
    * NULL versions: an update whose version tuple is (partly) null
    * cannot prove it is newer, so it never REPLACES a stored row (the
    * SQL three-valued comparison makes the predicate null → filtered);
    * it still INSERTS when the key is absent, where there is nothing
    * to protect. Feed non-null version columns when every event must
    * land. */
  private def versionFilter(base: DataFrame, updates: DataFrame,
                            keys: Seq[String], versionCols: Seq[String]): DataFrame =
    if (versionCols.isEmpty) updates
    else {
      val stored = base.select(
        keys.map(col) :+ struct(versionCols.map(col): _*).as("__stored_v"): _*)
      updates.join(stored, keys, "left")
        .filter(col("__stored_v").isNull ||
          struct(versionCols.map(col): _*) > col("__stored_v"))
        .drop("__stored_v")
    }

  /** Upsert into a stored table, rewriting ONLY the key-hash buckets the
    * batch touches.
    *
    * Layout: `path/gbucket=N/…parquet` + `_graft_merge.meta` pinning
    * (nBuckets, keys). Per batch: (1) hash each update key to its bucket;
    * (2) collect the distinct touched bucket ids (≤ nBuckets values — a
    * metadata-sized collect); (3) ONE job reads just those bucket
    * directories, anti-joins against the broadcast batch, and writes the
    * merged buckets to a hidden tmp sibling; (4) each touched bucket
    * swaps in via the same two-rename discipline as
    * [[graft.core.Sinks.atomicSwap]] (dot-prefixed backup sibling inside
    * the root, invisible to partition discovery). Bytes read and written
    * are proportional to the TOUCHED BUCKETS, never the table.
    *
    * Crash safety = per-bucket atomicity + idempotent replay. Each
    * bucket's swap is individually atomic; a crash mid-batch leaves some
    * buckets updated and others not, and the at-least-once replay of the
    * batch re-asserts the same keyed rows into every touched bucket —
    * already-updated buckets are a content no-op (with `versionCols`,
    * equal versions are filtered as not-strictly-greater), so the table
    * converges to exactly the committed state. A bucket stranded in the
    * two-rename window (backup present, directory absent) is restored on
    * the next call, as is a root stranded by the create path.
    *
    * A missing table is CREATED bucketed from the batch via the root
    * atomicSwap; a pre-existing FLAT table (the legacy layout) is
    * migrated to buckets in one final O(table) rewrite, also via the
    * root swap.
    *
    * `versionCols` (optional): enforce cross-batch monotonicity — an
    * update only lands if its version tuple strictly exceeds the stored
    * row's ([[versionFilter]]). Read the table back with [[readTable]]
    * (drops the internal bucket column).
    */
  def upsertInto(spark: SparkSession, path: String, updates: DataFrame,
                 keys: Seq[String], nBuckets: Int = 64,
                 versionCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "upsertInto needs at least one key column")
    require(nBuckets > 0, "nBuckets must be positive")
    require(!updates.columns.contains(BucketCol),
      s"updates must not carry a '$BucketCol' column — it is the table's internal bucket partition")
    graft.core.Sinks.recoverStrandedBackup(path)
    recoverBucketBackups(path)
    val root = new java.io.File(path)
    val metaF = new java.io.File(root, MetaFile)
    if (!root.isDirectory) {
      // first write: CREATE the bucketed table from the batch through the
      // root-level swap (write-tmp-then-rename — a crash mid-create never
      // leaves a half-written directory at `path` that wedges replays)
      graft.core.Sinks.atomicSwap(path, "merge") { tmp =>
        writeBucketed(updates, keys, nBuckets, tmp)
      }
    } else if (!metaF.isFile) {
      // legacy flat table: migrate to the bucketed layout in one final
      // whole-table rewrite (the last O(table) batch it will ever pay)
      val flat = spark.read.parquet(path)
      val merged = upsert(flat, versionFilter(flat, updates, keys, versionCols), keys)
      graft.core.Sinks.atomicSwap(path, "merge") { tmp =>
        writeBucketed(merged, keys, nBuckets, tmp)
      }
    } else {
      val meta = readMeta(metaF)
      require(meta._2 == keys,
        s"table at $path is keyed by [${meta._2.mkString(",")}], not [${keys.mkString(",")}]")
      val n = meta._1
      // dtype parity up front — not just when existing buckets are read
      // (a batch touching only NEW buckets would otherwise hash drifted
      // key types into buckets inconsistent with prior batches')
      val storedSchema = bucketSchema(spark, path)
        .filter(_.name != BucketCol).map(f => f.name -> f.dataType).sortBy(_._1)
      val updSchema = updates.schema.map(f => f.name -> f.dataType).sortBy(_._1)
      require(storedSchema == updSchema,
        s"schema mismatch: table [${storedSchema.map(c => s"${c._1}:${c._2.simpleString}").mkString(",")}] vs " +
          s"updates [${updSchema.map(c => s"${c._1}:${c._2.simpleString}").mkString(",")}]")
      val upd = updates.withColumn(BucketCol, bucketExpr(keys, n))
      upd.persist()
      try {
        val touched = upd.select(BucketCol).distinct()
          .collect().map(_.getInt(0)).sorted
        if (touched.nonEmpty) {
          val existing = touched.filter(b =>
            new java.io.File(root, s"$BucketCol=$b").isDirectory)
          val merged =
            if (existing.isEmpty) upd
            else {
              // read ONLY the touched bucket directories; basePath keeps
              // the bucket partition column so the merged write can
              // partition straight back out
              val base = spark.read.option("basePath", path)
                .parquet(existing.map(b => s"$path/$BucketCol=$b"): _*)
              upsert(base, versionFilter(base, upd, keys, versionCols), keys)
            }
          val tmp = java.nio.file.Paths.get(path)
            .resolveSibling(s".${root.getName}.merge_tmp")
          org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
          merged.write.mode("overwrite")
            .partitionBy(BucketCol).parquet(tmp.toString)
          touched.foreach { b =>
            val src = tmp.resolve(s"$BucketCol=$b")
            val dst = root.toPath.resolve(s"$BucketCol=$b")
            val bak = root.toPath.resolve(s".$BucketCol=$b.merge_old")
            if (!java.nio.file.Files.exists(src)) {
              // merged had no rows for this bucket (possible only when an
              // existing bucket dir held zero rows) — nothing to swap
            } else if (java.nio.file.Files.exists(dst)) {
              java.nio.file.Files.move(dst, bak,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              java.nio.file.Files.move(src, dst,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              org.apache.commons.io.FileUtils.deleteDirectory(bak.toFile)
            } else {
              java.nio.file.Files.move(src, dst,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            }
          }
          org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
        }
      } finally upd.unpersist()
    }
  }

  /** Read a merge table back without its internal bucket column. Also
    * heals any bucket stranded mid-swap first, so a reader after a crash
    * sees the pre-crash rows rather than a hole. */
  def readTable(spark: SparkSession, path: String): DataFrame = {
    graft.core.Sinks.recoverStrandedBackup(path)
    recoverBucketBackups(path)
    val df = spark.read.parquet(path)
    if (df.columns.contains(BucketCol)) df.drop(BucketCol) else df
  }

  /** Point read: the rows for ONE key tuple, reading ONLY the bucket
    * the key hashes into — the row-keyed generalization of the
    * reference's O(1) current-pointer GET (one object read under
    * `current/`, /root/reference/file/api.go:64-79). At 100 TB with
    * 4096 buckets a lookup scans 1/4096 of the table whatever the key;
    * a flat (non-bucketed legacy) table falls back to a full scan.
    * `key` pairs with the table's meta key order. */
  def lookup(spark: SparkSession, path: String, key: Seq[Any]): DataFrame = {
    graft.core.Sinks.recoverStrandedBackup(path)
    recoverBucketBackups(path)
    val root = new java.io.File(path)
    val metaF = new java.io.File(root, MetaFile)
    require(root.isDirectory, s"no table at $path")
    require(metaF.isFile,
      s"$path is a legacy flat table — migrate via upsertInto before lookup")
    val (n, keys) = readMeta(metaF)
    require(key.size == keys.size,
      s"lookup key arity ${key.size} != table keys [${keys.mkString(",")}]")
    // derive the bucket with the SAME Catalyst expression that wrote the
    // layout (a driver-side reimplementation of xxhash64 would be a
    // correctness trap), evaluated on a one-row local relation — no
    // scan. Literals CAST to the stored key types: xxhash64 hashes an
    // int and a long differently, so an uncast Int probe of a LONG key
    // would silently search the wrong bucket.
    val schema = bucketSchema(spark, path)
    val b = spark.range(1)
      .select(keys.zip(key).map { case (k, v) =>
        lit(v).cast(schema(k).dataType).as(k) }: _*)
      .select(bucketExpr(keys, n).as("b")).head().getInt(0)
    val bucketDir = new java.io.File(root, s"$BucketCol=$b")
    if (!bucketDir.isDirectory) return readTable(spark, path).limit(0)
    val rows = spark.read.parquet(bucketDir.getPath)
    keys.zip(key).foldLeft(rows) { case (df, (k, v)) => df.filter(col(k) === lit(v)) }
  }

  /** Keyed DELETE: remove every base row whose key appears in
    * `delKeys` (a relation of exactly the key columns), rewriting ONLY
    * the buckets those keys hash into — same touched-bucket discipline,
    * crash windows and idempotent replay as [[upsertInto]]. A bucket
    * whose rows are all deleted is REMOVED (through the backup rename,
    * so a crash mid-removal restores and the replay re-deletes). */
  def deleteFrom(spark: SparkSession, path: String, delKeys: DataFrame): Unit = {
    graft.core.Sinks.recoverStrandedBackup(path)
    recoverBucketBackups(path)
    val root = new java.io.File(path)
    val metaF = new java.io.File(root, MetaFile)
    require(root.isDirectory, s"no table at $path")
    require(metaF.isFile,
      s"$path is a legacy flat table — migrate via upsertInto before deleteFrom")
    val (n, keys) = readMeta(metaF)
    require(delKeys.columns.sorted.sameElements(keys.sorted),
      s"delKeys columns [${delKeys.columns.sorted.mkString(",")}] must be exactly " +
        s"the table keys [${keys.sorted.mkString(",")}]")
    // dtype parity with the stored keys: a drifted delKeys type would
    // hash into the wrong bucket (xxhash64 is type-sensitive) and the
    // anti-join would silently widen instead of failing fast
    val stored = bucketSchema(spark, path)
    keys.foreach { k =>
      require(delKeys.schema(k).dataType == stored(k).dataType,
        s"delKeys.$k is ${delKeys.schema(k).dataType.simpleString}, table " +
          s"stores ${stored(k).dataType.simpleString}")
    }
    val del = delKeys.withColumn(BucketCol, bucketExpr(keys, n))
    del.persist()
    try {
      val touched = del.select(BucketCol).distinct()
        .collect().map(_.getInt(0)).sorted
      val existing = touched.filter(b =>
        new java.io.File(root, s"$BucketCol=$b").isDirectory)
      if (existing.nonEmpty) {
        val base = spark.read.option("basePath", path)
          .parquet(existing.map(b => s"$path/$BucketCol=$b"): _*)
        val kept = base.join(del.drop(BucketCol), keys, "left_anti")
        val tmp = java.nio.file.Paths.get(path)
          .resolveSibling(s".${root.getName}.merge_tmp")
        org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
        kept.write.mode("overwrite").partitionBy(BucketCol).parquet(tmp.toString)
        existing.foreach { b =>
          val src = tmp.resolve(s"$BucketCol=$b")
          val dst = root.toPath.resolve(s"$BucketCol=$b")
          val bak = root.toPath.resolve(s".$BucketCol=$b.merge_old")
          java.nio.file.Files.move(dst, bak,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          if (java.nio.file.Files.exists(src))
            java.nio.file.Files.move(src, dst,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          // src absent = every row of this bucket was deleted: the
          // bucket simply does not come back
          org.apache.commons.io.FileUtils.deleteDirectory(bak.toFile)
        }
        org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
        // deleting every remaining row must not leave a schema-less
        // (unreadable, unupsertable) table
        ensureSchemaBucket(root, kept.drop(BucketCol).limit(0))
      }
    } finally del.unpersist()
  }

  /** Bucket + write `df` (which must NOT yet carry [[BucketCol]]) as the
    * bucketed layout at `dir`, meta sidecar included. */
  private def writeBucketed(df: DataFrame, keys: Seq[String], n: Int,
                            dir: String): Unit = {
    df.withColumn(BucketCol, bucketExpr(keys, n))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(dir)
    // a zero-row frame writes NO partition directories, which would
    // leave a table Spark cannot infer a schema from (every reader and
    // the next batch would throw) — pin the schema with one empty
    // bucket-0 part file
    ensureSchemaBucket(new java.io.File(dir), df.limit(0))
    val meta = s"buckets=$n\nkeys=${keys.mkString(",")}\n"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, MetaFile),
      meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** If `root` holds no bucket directory, write `empty` (a zero-row
    * frame carrying the table's DATA columns) into `gbucket=0` so the
    * table keeps an inferable schema — the guard that lets a table
    * whose every row was deleted (or that was created from an empty
    * batch) stay readable and upsertable. */
  private def ensureSchemaBucket(root: java.io.File,
                                 empty: DataFrame): Unit = {
    val hasBucket = Option(root.listFiles()).getOrElse(Array.empty)
      .exists(f => f.isDirectory && f.getName.startsWith(BucketCol + "="))
    if (!hasBucket)
      empty.repartition(1).write.mode("overwrite")
        .parquet(new java.io.File(root, s"$BucketCol=0").getPath)
  }

  /** Data-column schema from ONE bucket directory's footers — O(1) in
    * table size, where a root-level read would LIST EVERY bucket's
    * files per call (the metadata cost the bucketed design exists to
    * avoid: at 4096 buckets that is a full-table listing per batch /
    * per point lookup). A bucketed table always has at least one
    * bucket directory ([[ensureSchemaBucket]]). */
  private def bucketSchema(spark: SparkSession,
                           path: String): org.apache.spark.sql.types.StructType = {
    val b = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(BucketCol + "="))
      .sortBy(_.getName).headOption
      .getOrElse(throw new IllegalStateException(
        s"no bucket directories under $path"))
    spark.read.parquet(b.getPath).schema
  }

  private def readMeta(f: java.io.File): (Int, Seq[String]) = {
    val lines = java.nio.file.Files.readAllLines(f.toPath)
    val kv = lines.toArray(Array.empty[String])
      .filter(_.contains("=")).map { l =>
        val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
      }.toMap
    (kv("buckets").toInt, kv("keys").split(",").toSeq)
  }

  /** Heal buckets stranded in the two-rename window: a dot-prefixed
    * `.gbucket=N.merge_old` with its target directory ABSENT is the
    * pre-crash bucket — restore it; with the target present the swap
    * completed and the backup is stale debris — delete it (the target
    * holds the newer rows). */
  private def recoverBucketBackups(path: String): Unit = {
    val root = new java.io.File(path)
    if (!root.isDirectory) return
    val pat = ("^\\.(" + BucketCol + "=\\d+)\\.merge_old$").r
    Option(root.listFiles()).getOrElse(Array.empty).foreach { f =>
      f.getName match {
        case pat(target) =>
          val dst = new java.io.File(root, target)
          if (dst.isDirectory)
            org.apache.commons.io.FileUtils.deleteDirectory(f)
          else
            java.nio.file.Files.move(f.toPath, dst.toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        case _ =>
      }
    }
  }
}
