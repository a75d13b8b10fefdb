package graft.operators

import graft.SparkSpec

class SequencePackerSpec extends SparkSpec {
  import spark.implicits._

  private def pack(docs: Seq[PackDoc], cap: Long = 256L,
                   parts: Int = 4): Map[(String, String), PackShard] =
    SequencePacker.nextFitDecreasing(
        spark.createDataset(docs).repartition(parts), cap)
      .collect().map(r => (r.lang, r.source) -> r).toMap

  test("crafted geometry: exact fits, overflow boundary, truncation") {
    // cap 10; tokens desc = [9, 6, 4, 3, 2]: bin1 = 9, bin2 = 6+4,
    // bin3 = 3+2 → 3 bins of 24 tokens (lower bound ⌈24/10⌉ = 3)
    val a = Seq(9L, 6L, 4L, 3L, 2L).zipWithIndex.map { case (t, i) =>
      PackDoc("en", "s", i.toLong, t)
    }
    val ra = pack(a, cap = 10L)(("en", "s"))
    assert(ra.n_bins == 3L && ra.total_tokens == 24L &&
      ra.lower_bound == 3L && ra.gap_bins == 0L)
    assert(ra.util_ppm == 24L * 1000000L / 30L)
    // an over-long doc truncates to the cap and fills one bin exactly
    val b = Seq(PackDoc("en", "s", 0L, 999L), PackDoc("en", "s", 1L, 1L))
    val rb = pack(b, cap = 10L)(("en", "s"))
    assert(rb.total_tokens == 11L && rb.n_bins == 2L)
    // next-fit does NOT backtrack: [6, 5, 4] at cap 10 → 6 | 5+4 even
    // though 6+4 would fit — the gap column records the cost honestly
    val c = Seq(PackDoc("en", "s", 0L, 6L), PackDoc("en", "s", 1L, 5L),
      PackDoc("en", "s", 2L, 4L))
    val rc = pack(c, cap = 10L)(("en", "s"))
    assert(rc.n_bins == 2L && rc.lower_bound == 2L && rc.gap_bins == 0L)
  }

  test("bit-identical under 1/3/32 partitions and equal to a naive replay on real data") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("lang", "source", "doc_id",
        "LEAST(CAST(size(split(text, ' ')) AS BIGINT), 256L) AS tokens")
      .as[PackDoc].collect().toSeq
    val expected = docs.groupBy(d => (d.lang, d.source)).map {
      case (k, ds) =>
        val sorted = ds.sortBy(d => (-d.tokens, d.doc_id))
        var bins = 0L; var rem = 0L; var total = 0L
        sorted.foreach { d =>
          total += d.tokens
          if (bins == 0L || d.tokens > rem) { bins += 1; rem = 256L - d.tokens }
          else rem -= d.tokens
        }
        k -> (bins, total)
    }
    for (p <- Seq(1, 3, 32)) {
      val got = pack(docs, parts = p)
      assert(got.keySet == expected.keySet)
      expected.foreach { case (k, (bins, total)) =>
        assert(got(k).n_bins == bins && got(k).total_tokens == total,
          s"shard $k at $p partitions")
        assert(got(k).gap_bins == got(k).n_bins - got(k).lower_bound)
      }
    }
  }

  test("packing never beats the lower bound and always fits capacity") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("lang", "source", "doc_id",
        "LEAST(CAST(size(split(text, ' ')) AS BIGINT), 256L) AS tokens")
      .as[PackDoc].collect().toSeq
    pack(docs).values.foreach { r =>
      assert(r.n_bins >= r.lower_bound)
      assert(r.util_ppm <= 1000000L)
      assert(r.total_tokens <= r.n_bins * 256L)
    }
  }
}
