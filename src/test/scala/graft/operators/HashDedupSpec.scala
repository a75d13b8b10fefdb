package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Dedup invariants mirroring the reference's pure-function property
  * tables (/root/reference/download/common_test.go:258-407): duplicate in
  * scope detected, out-of-scope duplicate ignored, missing hash ⇒ new,
  * self-match ⇒ unique; plus cross-formulation equivalence and
  * idempotence, property-tested over seeded random tables.
  */
class HashDedupSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, String, Option[String])]) =
    rows.toDF("id", "scope", "hash")

  test("unique hash kept, duplicate dropped, scope respected") {
    val d = df(Seq(
      (1L, "a", Some("h1")), // dup of 2
      (2L, "a", Some("h1")),
      (3L, "a", Some("h2")), // unique
      (4L, "b", Some("h1"))  // same hash, different scope ⇒ unique
    ))
    val kept = HashDedup.uniques(d, col("hash"), Seq(col("scope")))
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(3L, 4L))
  }

  test("missing hash is conservatively kept (common.go:171-174)") {
    val d = df(Seq((1L, "a", None), (2L, "a", None), (3L, "a", Some("h"))))
    val kept = HashDedup.uniques(d, col("hash"), Seq(col("scope")))
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 3L))
  }

  private def randomRows(seed: Int): Seq[(Long, String, Option[String])] = {
    val rnd = new Random(seed)
    val n = rnd.nextInt(40)
    (0 until n).map { i =>
      val h = if (rnd.nextInt(5) == 0) None
              else Some("h" + rnd.nextInt(4))
      (i.toLong, "s" + rnd.nextInt(2), h)
    }
  }

  test("property: uniques == naive model; dedup is idempotent") {
    for (seed <- 1 to 15) {
      val rows = randomRows(seed)
      val got = HashDedup.uniques(df(rows), col("hash"), Seq(col("scope")))
        .select("id").as[Long].collect().toSet
      val expected = rows.filter { case (_, scope, h) =>
        h.isEmpty || rows.count(r => r._2 == scope && r._3 == h) == 1
      }.map(_._1).toSet
      assert(got == expected, s"seed=$seed")
      val again = HashDedup.uniques(
        df(rows.filter(r => got.contains(r._1))), col("hash"), Seq(col("scope")))
        .select("id").as[Long].collect().toSet
      assert(again == got, s"idempotence seed=$seed")
    }
  }

  test("property: anti-join formulation agrees with window formulation") {
    for (seed <- 16 to 25) {
      val nonNull = randomRows(seed).collect {
        case (id, s, Some(h)) => (id, s + "|" + h) // scope folded into key
      }
      val d = nonNull.toDF("id", "hash")
      val a = HashDedup.uniques(d, col("hash"), Nil).select("id").as[Long].collect().toSet
      val b = HashDedup.uniquesAntiJoin(d, "hash", "id").select("id").as[Long].collect().toSet
      assert(a == b, s"seed=$seed")
    }
  }

  test("keepFirst keeps the minimum id per (scope, hash)") {
    val d = df(Seq(
      (5L, "a", Some("h1")), (2L, "a", Some("h1")), (9L, "b", Some("h1")),
      (7L, "a", Some("h2"))))
    val kept = HashDedup.keepFirst(d, Seq(col("scope")), col("hash"), col("id"))
      .select("scope", "hash", "keep_id").as[(String, String, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(kept.toSeq == Seq(("a", "h1", 2L), ("a", "h2", 7L), ("b", "h1", 9L)))
  }

  test("keepFirst keeps every null-hash row individually (conservative rule)") {
    val d = df(Seq((1L, "a", None), (2L, "a", None), (3L, "a", Some("h"))))
    val kept = HashDedup.keepFirst(d, Seq(col("scope")), col("hash"), col("id"))
      .select("keep_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 3L)) // null hashes never merge
  }

  test("scopeOf extracts regex group 1 (maxmind month-scope semantics)") {
    val d = Seq("Maxmind/2017/09/15/file.tgz").toDF("name")
    val got = d.select(HashDedup.scopeOf(col("name"), "(.*/).*/.*").as("s"))
      .as[String].head()
    assert(got == "Maxmind/2017/09/")
  }
}
