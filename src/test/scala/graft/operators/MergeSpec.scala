package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "old", 10.0), (2L, "old", 20.0), (3L, "old", 30.0))
    .toDF("k", "status", "v")

  test("upsert: updates win on key, inserts land, untouched rows carry through") {
    val updates = Seq((2L, "new", 99.0), (4L, "new", 40.0)).toDF("k", "status", "v")
    val got = Merge.upsert(base, updates, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "old", 10.0), (2L, "new", 99.0), (3L, "old", 30.0), (4L, "new", 40.0)))
  }

  test("upsert with empty updates is identity; schema mismatch fails fast") {
    val empty = base.limit(0)
    assert(Merge.upsert(base, empty, Seq("k")).count() == 3)
    val wrong = Seq((1L, "x")).toDF("k", "status")
    intercept[IllegalArgumentException] {
      Merge.upsert(base, wrong, Seq("k"))
    }
  }

  test("upsert plan: base side anti-joins against a broadcast of the batch") {
    val updates = Seq((2L, "new", 99.0)).toDF("k", "status", "v")
    val plan = Merge.upsert(base, updates, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }

  test("upsertInto: stored table updated in place via atomic swap, no debris") {
    val dir = java.nio.file.Files.createTempDirectory("merge").toString
    val path = s"$dir/t"
    base.write.parquet(path)
    val updates = Seq((3L, "new", 33.0), (9L, "new", 90.0)).toDF("k", "status", "v")
    Merge.upsertInto(spark, path, updates, Seq("k"))
    val got = Merge.readTable(spark, path).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "old", 10.0), (2L, "old", 20.0), (3L, "new", 33.0), (9L, "new", 90.0)))
    val siblings = new java.io.File(dir).list().toSeq
    assert(siblings == Seq("t"), s"swap debris: $siblings")
  }

  test("upsertInto creates a missing table from the batch (via tmp + rename)") {
    val dir = java.nio.file.Files.createTempDirectory("merge_create").toString
    val path = s"$dir/t"
    val batch = Seq((1L, "a", 1.0)).toDF("k", "status", "v")
    Merge.upsertInto(spark, path, batch, Seq("k"))
    assert(Merge.readTable(spark, path).count() == 1)
    assert(new java.io.File(dir).list().toSeq == Seq("t"))
  }

  test("upsertInto restores a backup stranded between the two swap renames") {
    // simulate the crash window: table moved to the hidden backup, path
    // absent — the bug this pins: a later batch must NOT reinitialize
    // the table from itself alone
    val dir = java.nio.file.Files.createTempDirectory("merge_recover")
    val path = s"$dir/t"
    base.write.parquet(path)
    java.nio.file.Files.move(dir.resolve("t"), dir.resolve(".t.merge_old"))
    val updates = Seq((9L, "new", 90.0)).toDF("k", "status", "v")
    Merge.upsertInto(spark, path, updates, Seq("k"))
    val got = Merge.readTable(spark, path).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "old", 10.0), (2L, "old", 20.0), (3L, "old", 30.0), (9L, "new", 90.0)),
      "pre-crash rows must survive the recovery")
  }

  test("recovery restores the NEWEST stranded backup, not a stale cross-tag one") {
    // compact once crashed after its swap but before backup cleanup,
    // leaving a STALE .t.compact_old; later a merge crashed in its
    // rename window, stranding the CURRENT table at .t.merge_old with
    // the path absent — recovery must pick merge_old (newer), and the
    // stale compact snapshot must not roll the table back
    val dir = java.nio.file.Files.createTempDirectory("merge_xtag")
    val path = s"$dir/t"
    Seq((1L, "stale", 0.0)).toDF("k", "status", "v").write.parquet(path)
    java.nio.file.Files.move(dir.resolve("t"), dir.resolve(".t.compact_old"))
    base.write.parquet(path) // the real table, written later
    java.nio.file.Files.move(dir.resolve("t"), dir.resolve(".t.merge_old"))
    java.nio.file.Files.setLastModifiedTime(dir.resolve(".t.compact_old"),
      java.nio.file.attribute.FileTime.fromMillis(1000))
    java.nio.file.Files.setLastModifiedTime(dir.resolve(".t.merge_old"),
      java.nio.file.attribute.FileTime.fromMillis(2000))
    val updates = Seq((9L, "new", 90.0)).toDF("k", "status", "v")
    Merge.upsertInto(spark, path, updates, Seq("k"))
    val got = Merge.readTable(spark, path).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "old", 10.0), (2L, "old", 20.0), (3L, "old", 30.0), (9L, "new", 90.0)),
      "recovery rolled back to a stale snapshot")
    // and the successful swap cleaned up ALL backup debris
    assert(new java.io.File(dir.toString).list().toSeq == Seq("t"))
  }

  test("atomicSwap rejects tags recovery does not know") {
    val dir = java.nio.file.Files.createTempDirectory("swap_tag").toString
    intercept[IllegalArgumentException] {
      graft.core.Sinks.atomicSwap(s"$dir/t", "bogus")(_ => ())
    }
  }

  test("bucketed layout: a batch rewrites ONLY the buckets its keys hash into") {
    val dir = java.nio.file.Files.createTempDirectory("merge_buckets").toString
    val path = s"$dir/t"
    val big = spark.range(0, 512).selectExpr(
      "id as k", "'old' as status", "cast(id as double) as v")
    Merge.upsertInto(spark, path, big, Seq("k"), nBuckets = 8)
    val bucketDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith(Merge.BucketCol + "="))
    assert(bucketDirs.length == 8, "512 keys across 8 buckets should fill all")
    def snapshot() = bucketDirs.map(d =>
      d.getName -> Option(d.listFiles()).getOrElse(Array.empty)
        .map(f => (f.getName, f.lastModified())).toSeq.sorted).toMap
    val before = snapshot()
    // single-key batch: exactly one bucket may change
    Merge.upsertInto(spark, path, Seq((7L, "new", 77.0)).toDF("k", "status", "v"), Seq("k"))
    val after = snapshot()
    val changed = before.keys.filter(b => before(b) != after(b)).toSeq
    assert(changed.size == 1, s"batch touching one key rewrote buckets: $changed")
    val got = Merge.readTable(spark, path)
    assert(got.count() == 512)
    assert(got.filter($"k" === 7L).as[(Long, String, Double)].head() == ((7L, "new", 77.0)))
  }

  test("bucketed layout: a bucket stranded in the swap window is restored") {
    val dir = java.nio.file.Files.createTempDirectory("merge_bstrand").toString
    val path = s"$dir/t"
    val big = spark.range(0, 64).selectExpr(
      "id as k", "'old' as status", "cast(id as double) as v")
    Merge.upsertInto(spark, path, big, Seq("k"), nBuckets = 4)
    // simulate a crash between the two renames of one bucket
    val root = java.nio.file.Paths.get(path)
    val victim = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith(Merge.BucketCol + "=")).head
    java.nio.file.Files.move(victim.toPath,
      root.resolve(s".${victim.getName}.merge_old"))
    Merge.upsertInto(spark, path, Seq((999L, "new", 9.0)).toDF("k", "status", "v"), Seq("k"))
    assert(Merge.readTable(spark, path).count() == 65,
      "pre-crash bucket rows must survive recovery")
  }

  test("versionCols: an older update in a LATER batch cannot overwrite a newer stored row") {
    val dir = java.nio.file.Files.createTempDirectory("merge_ver").toString
    val path = s"$dir/t"
    Merge.upsertInto(spark, path,
      Seq((1L, 200L, "newer")).toDF("k", "ts", "status"),
      Seq("k"), versionCols = Seq("ts"))
    // late-arriving stale update: lower ts must be rejected vs the STORE
    Merge.upsertInto(spark, path,
      Seq((1L, 100L, "stale"), (2L, 50L, "insert")).toDF("k", "ts", "status"),
      Seq("k"), versionCols = Seq("ts"))
    // genuinely newer version wins; equal version is a no-op (strict >)
    Merge.upsertInto(spark, path,
      Seq((2L, 60L, "fresher"), (1L, 200L, "tie-noop")).toDF("k", "ts", "status"),
      Seq("k"), versionCols = Seq("ts"))
    val got = Merge.readTable(spark, path).orderBy("k")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 200L, "newer"), (2L, 60L, "fresher")), got.toString)
  }

  test("lookup reads ONLY the key's bucket and casts probe literals to stored types") {
    val dir = java.nio.file.Files.createTempDirectory("merge_lookup").toString
    val path = s"$dir/t"
    val big = spark.range(0, 256).selectExpr(
      "id as k", "'v' as status", "cast(id as double) as v")
    Merge.upsertInto(spark, path, big, Seq("k"), nBuckets = 8)
    // Int probe of a LONG key must still hit the right bucket (cast)
    val hit = Merge.lookup(spark, path, Seq(77))
    assert(hit.select("k", "v").as[(Long, Double)].collect().toSeq == Seq((77L, 77.0)))
    // the lookup plan reads one bucket directory, not the table root
    val scanned = hit.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Location")).mkString
    assert(scanned.contains(Merge.BucketCol + "="), scanned)
    // absent key: empty result with the table schema
    assert(Merge.lookup(spark, path, Seq(99999L)).isEmpty)
  }

  test("deleteFrom rewrites only touched buckets; a fully-deleted bucket is removed") {
    val dir = java.nio.file.Files.createTempDirectory("merge_del").toString
    val path = s"$dir/t"
    val big = spark.range(0, 128).selectExpr(
      "id as k", "'v' as status", "cast(id as double) as v")
    Merge.upsertInto(spark, path, big, Seq("k"), nBuckets = 4)
    Merge.deleteFrom(spark, path, Seq(5L, 17L).toDF("k"))
    val left = Merge.readTable(spark, path)
    assert(left.count() == 126)
    assert(left.filter($"k".isin(5L, 17L)).isEmpty)
    // delete EVERY key of one bucket: its directory must disappear
    val allB = spark.range(0, 128).selectExpr("id as k")
      .withColumn("b", org.apache.spark.sql.functions.expr(
        s"cast(pmod(xxhash64(k), 4) as int)"))
    val victims = allB.filter($"b" === 0).select("k").as[Long].collect()
    Merge.deleteFrom(spark, path, victims.toSeq.toDF("k"))
    assert(!new java.io.File(path, s"${Merge.BucketCol}=0").exists(),
      "fully-deleted bucket directory should be removed")
    assert(Merge.readTable(spark, path).count() == 126 - victims.count(v => v != 5L && v != 17L))
    // drifted delKeys dtype fails fast instead of hashing wrong buckets
    intercept[IllegalArgumentException] {
      Merge.deleteFrom(spark, path, Seq(1).toDF("k")) // Int vs stored LONG
    }
  }

  test("a table whose every row is deleted stays readable, lookupable, upsertable") {
    val dir = java.nio.file.Files.createTempDirectory("merge_empty").toString
    val path = s"$dir/t"
    val rows = spark.range(0, 32).selectExpr(
      "id as k", "'v' as status", "cast(id as double) as v")
    Merge.upsertInto(spark, path, rows, Seq("k"), nBuckets = 4)
    Merge.deleteFrom(spark, path, spark.range(0, 32).selectExpr("id as k"))
    // schema survives via the empty bucket-0 pin
    assert(Merge.readTable(spark, path).isEmpty)
    assert(Merge.readTable(spark, path).columns.sorted.toSeq == Seq("k", "status", "v"))
    assert(Merge.lookup(spark, path, Seq(3L)).isEmpty)
    // and the table accepts new batches again
    Merge.upsertInto(spark, path, Seq((7L, "back", 7.0)).toDF("k", "status", "v"), Seq("k"))
    assert(Merge.readTable(spark, path).as[(Long, String, Double)].collect().toSeq ==
      Seq((7L, "back", 7.0)))
  }

  test("creating a table from an empty batch leaves a readable empty table") {
    val dir = java.nio.file.Files.createTempDirectory("merge_empty_create").toString
    val path = s"$dir/t"
    Merge.upsertInto(spark, path, base.limit(0), Seq("k"))
    assert(Merge.readTable(spark, path).isEmpty)
    Merge.upsertInto(spark, path, Seq((1L, "x", 1.0)).toDF("k", "status", "v"), Seq("k"))
    assert(Merge.readTable(spark, path).count() == 1)
  }

  test("partial create debris (directory with no committed files) does not wedge replays") {
    // a crash during the old direct-create left tablePath holding only
    // _temporary; the swap form writes to a tmp sibling, so path stays
    // absent until the rename — simulate stale tmp debris and re-run
    val dir = java.nio.file.Files.createTempDirectory("merge_debris")
    val path = s"$dir/t"
    java.nio.file.Files.createDirectories(dir.resolve(".t.merge_tmp/_temporary"))
    val batch = Seq((1L, "a", 1.0)).toDF("k", "status", "v")
    Merge.upsertInto(spark, path, batch, Seq("k"))
    assert(Merge.readTable(spark, path).count() == 1)
  }
}
