package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class MinHashLshSpec extends SparkSpec {
  import spark.implicits._

  // docs with controlled overlap: pairs (2k, 2k+1) share most shingles
  private def fixture = {
    val rnd = new Random(11)
    val base = (0 until 12).map(_ => (0 until 40).map(_ => s"w${rnd.nextInt(200)}"))
    (0 until 12).flatMap { k =>
      val a = base(k)
      val b = a.take(34) ++ (0 until 6).map(_ => s"u${rnd.nextInt(200)}")
      Seq((2L * k, a.mkString(" ")), (2L * k + 1, b.mkString(" ")))
    }.toDF("doc_id", "text")
  }

  test("every emitted pair is exactly verified (precision 1 by construction)") {
    val docs = fixture
    val got = MinHashLsh.nearDup(docs, bands = 4, rowsPerBand = 2,
      shingleN = 3, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val exact = SimilarityJoin.jaccardPairsText(
        docs.as[(Long, String)], 3, 0.5)
      .select(col("a_id"), col("b_id"), col("jac"))
      .as[(Long, Long, Double)].collect().toSet
    got.foreach(p => assert(exact.contains(p), s"unverified pair $p"))
  }

  test("more bands (8,2) never lose pairs found at (4,2)") {
    val docs = fixture
    val at42 = MinHashLsh.nearDup(docs, 4, 2, 3, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val at82 = MinHashLsh.nearDup(docs, 8, 2, 3, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // bands 0..3 of (8,2) hash the same minhash pairs as (4,2): candidate
    // superset, and verification is parameter-independent
    assert(at42.subsetOf(at82))
  }

  test("empty-shingle docs are excluded, never forming a degenerate bucket") {
    // docs with < shingleN tokens have empty shingle sets: all their
    // minhashes are null, so without the up-front filter they'd all
    // share one null-band key and pair quadratically despite Jaccard 0
    val shortIds = (1000L until 1050L)
    val docs = fixture.union(
      shortIds.map(i => (i, "only two")).toDF("doc_id", "text"))
    val got = MinHashLsh.nearDup(docs, 4, 2, 3, 0.5)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val short = shortIds.toSet
    assert(got.forall { case (a, b, _) => !short(a) && !short(b) },
      "no pair may involve an empty-shingle doc")
  }

  test("identical-doc flood: all pairs emitted, strict a_id < b_id, no dup pairs") {
    // every doc identical -> every band key collides into one degenerate
    // bucket; the slim self-join must still emit exactly C(n,2) pairs
    // (each once, despite colliding in all 4 bands) at jac 1.0
    val n = 400
    val docs = (0 until n)
      .map(i => (i.toLong, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val got = MinHashLsh.nearDup(docs, 4, 2, 3, 0.5)
      .as[(Long, Long, Double)].collect()
    assert(got.length == n * (n - 1) / 2)
    assert(got.forall { case (a, b, j) => a < b && j == 1.0 })
    assert(got.map(p => (p._1, p._2)).distinct.length == got.length)
  }

  test("duplicate doc_ids in the input never emit an a_id == b_id pair") {
    val docs = fixture.union(fixture.limit(4)) // 4 ids appear twice
    val got = MinHashLsh.nearDup(docs, 4, 2, 3, 0.5)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (a, b, _) => a < b })
    // and exactly ONE row per pair: duplicated ids fan out the verify
    // signature joins (one row per signature combination) without the
    // final pair dedup
    assert(got.map(p => (p._1, p._2)).distinct.length == got.length,
      "duplicate doc_ids multiplied candidate pairs in the output")
    // the duplicated-id rows are identical text, so the pair set must
    // equal the clean run's
    val clean = MinHashLsh.nearDup(fixture, 4, 2, 3, 0.5)
      .as[(Long, Long, Double)].collect()
    assert(got.map(p => (p._1, p._2)).toSet == clean.map(p => (p._1, p._2)).toSet)
  }

  test("bucketed band table: candidate self-join plans with zero bk-Exchange " +
       "and matches the direct path") {
    // the stored 100 TB layout: band keys materialized at ingest,
    // bucketed+sorted by bk — the recurring dedup run's self-join then
    // reads co-located buckets instead of shuffling the corpus
    val docs = fixture
    val sig = MinHashLsh.signatures(docs, 8, 3)
    MinHashLsh.bandTable(sig, 4, 2)
      .write.bucketBy(4, "bk").sortBy("bk")
      .mode("overwrite").saveAsTable("probe_bands_b")
    sig.select("doc_id", "shh").write.mode("overwrite").saveAsTable("probe_shh_t")
    val res = MinHashLsh.nearDupFromBands(
      spark.table("probe_bands_b"),
      spark.table("probe_shh_t"), 0.5)
    val got = res.as[(Long, Long, Double)].collect().toSet
    val direct = MinHashLsh.nearDup(docs, 4, 2, 3, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == direct)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(bk"),
      s"band self-join still shuffles the bucketed table:\n$plan")
  }

  test("incremental nearDupAgainst equals the full self-join restricted to " +
       "cross-side pairs") {
    val docs = fixture
    val stored = MinHashLsh.signatures(docs.filter(col("doc_id") % 2 === 0), 8, 3)
    val incoming = MinHashLsh.signatures(docs.filter(col("doc_id") % 2 === 1), 8, 3)
    val inc = MinHashLsh.nearDupAgainst(incoming, stored, 4, 2, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // ground truth: the full self-join's pairs with one odd + one even
    // member, re-keyed as (odd new_id, even dup_of)
    val full = MinHashLsh.nearDup(docs, 4, 2, 3, 0.5)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => (a % 2) != (b % 2) }
      .map { case (a, b, j) => if (a % 2 == 1) (a, b, j) else (b, a, j) }
      .toSet
    assert(inc == full)
    assert(inc.nonEmpty) // fixture pairs (2k, 2k+1) are cross-parity by design
  }

  test("precomputed-signature path (parquet round-trip) equals the direct path") {
    val docs = fixture
    val direct = MinHashLsh.nearDup(docs, 4, 2, 3, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // the 100 TB shape: signatures stored at ingest, near-dup runs from
    // the stored columns without touching text
    val sigPath = java.nio.file.Files.createTempDirectory("graft_sig").toString
    MinHashLsh.signatures(docs, 8, 3).write.mode("overwrite").parquet(sigPath)
    val fromStored = MinHashLsh.nearDupFromSignatures(
        spark.read.parquet(sigPath), 4, 2, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(direct.nonEmpty && fromStored == direct)
  }

  test("(8,2) recall against exact ground truth >= (4,2) recall") {
    val docs = fixture
    val exact = SimilarityJoin.jaccardPairsText(docs.as[(Long, String)], 3, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    def recall(b: Int, r: Int): Double = {
      val got = MinHashLsh.nearDup(docs, b, r, 3, 0.5)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      if (exact.isEmpty) 1.0 else got.intersect(exact).size.toDouble / exact.size
    }
    assert(exact.nonEmpty)
    assert(recall(8, 2) >= recall(4, 2))
  }

  test("bandTable refuses a band layout exceeding the stored family size") {
    // 8-member family banded 8×2 would read mh[8..15] = null and
    // concat_ws SKIPS nulls — every doc would share keys "0".."7" and
    // the candidate join would silently go N×N; the guard must name it
    val sig = MinHashLsh.signatures(fixture, 8, 3)
    val e = intercept[Exception](MinHashLsh.bandTable(sig, 8, 2).count())
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + messages(t.getCause)
    assert(messages(e).contains("exceeds stored minhash family size"), messages(e))
    // the exact fit still works
    assert(MinHashLsh.bandTable(sig, 4, 2).count() > 0)
  }
}
