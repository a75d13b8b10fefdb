package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import scala.util.Random

class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private def antiJoinReference(batch: Seq[(Long, String)],
                                stored: Seq[String]): Set[Long] = {
    val s = stored.toSet
    batch.collect { case (id, k) if !s.contains(k) => id }.toSet
  }

  test("result is EXACTLY the anti-join, independent of fpp (no false negatives)") {
    // aggressive fpp so false positives actually occur and the confirm
    // join has real work to do; seeded sweep over overlapping key sets
    val rnd = new Random(84)
    def keySet() = List.fill(60)(s"k${rnd.nextInt(90)}").distinct
    (1 to 8).foreach { _ =>
      val batchKeys = keySet()
      val storedKeys = keySet()
      val batch = batchKeys.zipWithIndex
        .map { case (k, i) => (i.toLong, k) }
      val batchDf = batch.toDF("id", "k")
      val storedDf = storedKeys.toDF("k")
      val bloom = BloomDedup.buildBloom(storedDf, "k",
        expectedN = math.max(1, storedKeys.size).toLong, fpp = 0.5)
      val got = BloomDedup.newKeys(batchDf, storedDf, "k", bloom)
        .select("id").as[Long].collect().toSet
      assert(got === antiJoinReference(batch, storedKeys))
    }
  }

  test("null keys are conservatively kept (NOT EXISTS semantics)") {
    val batch = Seq((1L, "a"), (2L, null), (3L, "b"))
      .toDF("id", "k")
    val stored = Seq("a", null).toDF("k")
    val bloom = BloomDedup.buildBloom(stored.filter(col("k").isNotNull), "k", 2L, 0.03)
    val got = BloomDedup.newKeys(batch, stored, "k", bloom)
      .select("id").as[Long].collect().toSet
    // "a" is stored → dropped; null never equals anything → kept
    assert(got === Set(2L, 3L))
  }

  test("bloom-negative branch reaches output with ZERO shuffle") {
    val batch = (0L until 100L).map(i => (i, s"new$i")).toDF("id", "k")
    val stored = (0L until 50L).map(i => s"old$i").toDF("k")
    val bloom = BloomDedup.buildBloom(stored, "k", 50L, 0.03)
    val negatives = batch.filter(
      !org.apache.spark.sql.GraftShim.column(
        graft.functions.expressions.BloomMightContain(
          org.apache.spark.sql.GraftShim.expression(xxhash64(col("k"))), bloom)))
    val plan = negatives.queryExecution.executedPlan
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"the pass-through branch must not shuffle:\n$plan")
  }

  test("an EMPTY stored set is legal: sketch builds and every batch row survives") {
    val batch = (0L until 20L).map(i => (i, s"k$i")).toDF("id", "k")
    val stored = spark.emptyDataset[String].toDF("k")
    val bloom = BloomDedup.buildBloom(stored, "k", expectedN = 0L, fpp = 0.03)
    val got = BloomDedup.newKeys(batch, stored, "k", bloom)
    assert(got.count() === 20L)
  }

  test("sketch answers true for every stored key (the contract exactness rests on)") {
    val storedKeys = (0 until 500).map(i => s"key-$i-${i * 31}")
    val bloom = BloomDedup.buildBloom(storedKeys.toDF("k"), "k", 500L, 0.01)
    val batch = storedKeys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("id", "k")
    // every batch row duplicates a stored key → result must be empty
    val got = BloomDedup.newKeys(batch, storedKeys.toDF("k"), "k", bloom)
    assert(got.count() === 0L)
  }
}
