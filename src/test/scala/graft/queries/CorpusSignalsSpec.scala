package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.core.Tables

/** Round-6 corpus-signal queries: Gopher rule gate (q102), positional
  * winnowing (q103), vocabulary growth (q104), perplexity terciles
  * (q105), novelty rate (q106). Each test pins the PROPERTY that makes
  * the signal trustworthy — rule boundaries are exact-integer, the
  * winnowing guarantee holds, curves are monotone, buckets partition,
  * novelty decomposes — not just a golden row count.
  */
class CorpusSignalsSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(docs: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("sig_docs").toString
    docs.toDF("doc_id", "text", "lang").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def prose(seed: Int, words: Int): String = {
    val rnd = new scala.util.Random(seed)
    (0 until words).map(_ => {
      val len = 3 + rnd.nextInt(6)
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }).mkString(" ")
  }

  // ------------------------------------------------------------- q102
  test("q102: every rule boundary is exact — one token / one char / one stopword flips the gate") {
    // 50 four-char tokens incl. 2 stopwords, max word 'the' ×2 → all pass
    val pass = (Seq("the", "the") ++ (0 until 48).map(i => f"w$i%03d")).mkString(" ")
    // 49 tokens → r_len fails
    val short = (Seq("the", "the") ++ (0 until 47).map(i => f"w$i%03d")).mkString(" ")
    // one stopword → r_stop fails
    val oneStop = (Seq("the") ++ (0 until 49).map(i => f"w$i%03d")).mkString(" ")
    // mean word length below 3: fifty 2-char words (+2 stops keep r_stop)
    val thin = (Seq("of", "to") ++ (0 until 48).map(i => f"a$i".take(2))).mkString(" ")
    // max word share: 11 of 50 = 22% > 20% → r_maxword fails
    val loop = (Seq.fill(11)("the") ++ (0 until 39).map(i => f"w$i%03d")).mkString(" ")
    val d = docsDir(Seq((1L, pass, "en"), (2L, short, "en"), (3L, oneStop, "en"),
      (4L, thin, "en"), (5L, loop, "en")))
    val got = PipelineQueries.q102(spark, d)
      .select("doc_id", "r_len", "r_wordlen", "r_stop", "r_maxword", "pass")
      .as[(Long, Int, Int, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 1, 1, 1, 1, 1)), s"all-rules doc: ${got(1L)}")
    assert(got(2L)._2 == 0 && got(2L)._6 == 0, s"49 tokens must fail r_len: ${got(2L)}")
    assert(got(3L)._4 == 0, s"one stopword must fail r_stop: ${got(3L)}")
    assert(got(4L)._3 == 0, s"2-char words must fail r_wordlen: ${got(4L)}")
    assert(got(5L)._5 == 0 && got(5L)._2 == 1, s"22% single word must fail only r_maxword: ${got(5L)}")
  }

  test("q102: mean-word-length bounds are inclusive (exactly 3.0 and 10.0 pass)") {
    val exact3 = (Seq("the", "and") ++ Seq.fill(48)("abc")).mkString(" ")  // 50×3 chars
    val exact10 = (Seq("theedgeofx", "anotherten") ++
      Seq.fill(48)("abcdefghij")).mkString(" ")                            // 50×10 chars
    val d = docsDir(Seq((1L, exact3, "en"), (2L, exact10, "en")))
    val got = PipelineQueries.q102(spark, d)
      .select("doc_id", "r_wordlen").as[(Long, Int)].collect().toMap
    assert(got(1L) == 1 && got(2L) == 1,
      s"boundary means must pass inclusively: $got")
  }

  // ------------------------------------------------------------- q103
  test("q103: the winnowing guarantee — docs sharing an 8+ char substring share a fingerprint") {
    val shared = "zqxvkwjy" // 8 = w + k - 1 chars, alphabet unlikely in prose
    val a = prose(1, 300) + " " + shared + " " + prose(2, 10)
    val b = prose(3, 10) + " " + shared + " " + prose(4, 300)
    val d = docsDir(Seq((1L, a, "en"), (2L, b, "en")))
    val got = PipelineQueries.q103(spark, d)
      .select("doc_id", "n_shared").as[(Long, Long)].collect().toMap
    assert(got(1L) >= 1 && got(2L) >= 1,
      s"8-char shared substring must surface in both docs' shared fingerprints: $got")
  }

  test("q103: fingerprint density tracks 2/(w+1) and unrelated docs stay near zero sharing") {
    val d = docsDir(Seq((1L, prose(11, 400), "en"), (2L, prose(12, 400), "en")))
    val got = PipelineQueries.q103(spark, d)
      .select("doc_id", "n_fp", "shared_ratio")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val nGrams = 400 * 7 - 4 // ≈ chars - 4; loose lower bound on windows
    val density = got(1L)._1.toDouble / nGrams
    assert(density > 0.15 && density < 0.6,
      s"winnowing density $density far from the 2/(w+1)=0.4 expectation")
    assert(got(1L)._2 < 0.05 && got(2L)._2 < 0.05,
      s"unrelated docs report fingerprint sharing: $got")
  }

  // ------------------------------------------------------------- q104
  test("q104: curves are monotone and totals reconcile with the corpus") {
    val rows = PipelineQueries.q104(spark, sf0001)
      .select("bucket", "n_tokens", "n_new_terms", "cum_vocab", "cum_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    // running sums really run
    rows.foldLeft((0L, 0L)) { case ((v, t), r) =>
      assert(r._4 == v + r._3, s"cum_vocab break at bucket ${r._1}")
      assert(r._5 == t + r._2, s"cum_tokens break at bucket ${r._1}")
      (r._4, r._5)
    }
    // final cum_vocab == corpus distinct tokens; cum_tokens == corpus tokens
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.load(spark, sf0001, "documents")
    val toks = docs.select(explode(split(col("text"), " ")).as("t"))
    val (vocab, total) = (toks.distinct().count(), toks.count())
    assert(rows.last._4 == vocab, s"cum_vocab ${rows.last._4} != corpus vocab $vocab")
    assert(rows.last._5 == total, s"cum_tokens ${rows.last._5} != corpus tokens $total")
  }

  // ------------------------------------------------------------- q105
  test("q105: terciles partition each language and score ranges are ordered head ≥ middle ≥ tail") {
    val rows = PipelineQueries.q105(spark, sf0001)
      .select("lang", "bucket", "n_docs", "min_logp", "max_logp")
      .as[(String, Long, Long, Double, Double)].collect()
    val byLang = rows.groupBy(_._1)
    val docs = graft.core.Tables.load(spark, sf0001, "documents")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    byLang.foreach { case (lang, bs) =>
      assert(bs.map(_._2).sorted.toSeq == Seq(0L, 1L, 2L), s"$lang missing a bucket")
      assert(bs.map(_._3).sum == docs(lang), s"$lang buckets don't partition its docs")
      val sizes = bs.sortBy(_._2).map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang tercile sizes unbalanced: ${sizes.toSeq}")
      val s = bs.sortBy(_._2)
      assert(s(0)._4 >= s(1)._5 && s(1)._4 >= s(2)._5,
        s"$lang score ranges overlap across buckets: ${s.toSeq}")
    }
  }

  // ------------------------------------------------------------- q106
  test("q106: a verbatim duplicate has novelty 0, the corpus-first doc 1, and novel counts sum to the vocab of shingles") {
    val a = prose(21, 200)
    val d = docsDir(Seq((1L, a, "en"), (2L, prose(22, 200), "en"), (3L, a, "en")))
    val got = PipelineQueries.q106(spark, d)
      .select("doc_id", "n_shingles", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._4 == 1.0, s"first doc must be fully novel: ${got(1L)}")
    assert(got(3L)._4 == 0.0, s"verbatim dup must be zero-novel: ${got(3L)}")
    // novel counts decompose the corpus shingle vocabulary exactly
    import org.apache.spark.sql.functions._
    val corpusVocab = spark.read.parquet(s"$d/documents.parquet")
      .select(explode(graft.functions.TextOps.shinglesNative(col("text"), 3)).as("sg"))
      .distinct().count()
    assert(got.values.map(_._3).sum == corpusVocab,
      s"sum of per-doc novel shingles must equal the corpus shingle vocab $corpusVocab")
    assert(got(2L)._4 > 0.9, s"unrelated doc should be mostly novel: ${got(2L)}")
  }

  // ------------------------------------------------------------- q107
  test("q107: a perfectly exclusive adjacent pair scores npmi exactly 1.0 and ranks first") {
    // 'qq rr' always adjacent and each word only in that pair (c12 == c1
    // == c2 == 8); filler words co-occur in RANDOM order so no filler
    // pair is exclusive
    val rnd = new scala.util.Random(5)
    def filler() = (0 until 30).map(_ => s"f${rnd.nextInt(4)}").mkString(" ")
    val docs = (0 until 8).map(i =>
      (i.toLong, s"${filler()} qq rr ${filler()}", "en"))
    val got = PipelineQueries.q107(spark, docsDir(docs))
      .select("w1", "w2", "npmi").as[(String, String, Double)].collect()
    assert(got.nonEmpty && got.head == (("qq", "rr", 1.0)),
      s"exclusive pair must rank first at exactly 1.0: ${got.take(3).toSeq}")
    assert(got.tail.forall(_._3 < 1.0), "no other pair is exclusive")
  }

  // ------------------------------------------------------------- q108
  test("q108: matrix counts distinct shared content per source pair; diagonal is the dedup'd size") {
    val a = prose(41, 50); val b = prose(42, 50); val c = prose(43, 50)
    val docs = Seq(
      (1L, a, "s1"), (2L, a, "s1"),          // s1: {a} (dup collapses)
      (3L, a, "s2"), (4L, b, "s2"),          // s2: {a, b}
      (5L, b, "s3"), (6L, c, "s3"))          // s3: {b, c}
    val dir = docsDir(docs)
    // reuse lang slot as source: write with the real column name
    spark.read.parquet(s"$dir/documents.parquet")
      .withColumnRenamed("lang", "source")
      .write.mode("overwrite").parquet(s"$dir/d2/documents.parquet")
    val got = PipelineQueries.q108(spark, s"$dir/d2")
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      ("s1", "s1") -> 1L, ("s1", "s2") -> 1L,
      ("s2", "s2") -> 2L, ("s2", "s3") -> 1L,
      ("s3", "s3") -> 2L), s"wrong matrix: $got")
  }

  // ------------------------------------------------------------- q109
  test("q109: the split partitions docs, both sides materialize, and the leakage audit is zero") {
    PipelineQueries.clearLshPairs()
    val rows = PipelineQueries.q109(spark, sf0001)
      .select("side", "n_docs", "n_clusters", "cross_side_pairs")
      .as[(String, Long, Long, Long)].collect()
    val total = graft.core.Tables.load(spark, sf0001, "documents").count()
    assert(rows.map(_._1).sorted.toSeq == Seq("train", "val"), s"sides: ${rows.toSeq}")
    assert(rows.map(_._2).sum == total, "split must partition the corpus")
    assert(rows.forall(_._2 > 0), s"a side is empty: ${rows.toSeq}")
    assert(rows.forall(_._4 == 0L),
      s"near-dup pairs straddle the split: ${rows.toSeq}")
    // every near-dup pair's members share a side BY CONSTRUCTION —
    // check directly on the assignment, not just the audit column
    val docs = graft.core.Tables.load(spark, sf0001, "documents")
    val sided = graft.operators.DedupClusters
      .assignAll(docs, graft.operators.MinHashLsh.nearDup(
        docs, bands = 4, rowsPerBand = 2, shingleN = 3, minJaccard = 0.5))
      .withColumn("side", org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.md5(org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("split|"),
          org.apache.spark.sql.functions.col("component").cast("string"))) < "cc",
        "train").otherwise("val"))
    val comps = sided.select("component", "side").distinct()
      .groupBy("component").count().filter(org.apache.spark.sql.functions.col("count") > 1)
    assert(comps.count() == 0, "a cluster was assigned two sides")
  }

  // ------------------------------------------------------------- q110
  test("q110: exactly k per stratum, and adding one doc displaces at most the k-th pick") {
    val docs = (0 until 120).map(i =>
      (i.toLong, prose(600 + i, 30), if (i % 2 == 0) "en" else "de"))
    val d1 = docsDir(docs)
    val got = PipelineQueries.q110(spark, d1)
      .select("lang", "doc_id").as[(String, Long)].collect()
    val byLang = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byLang("en").size == 20 && byLang("de").size == 20,
      s"fixed-size draw must be exactly k: ${byLang.view.mapValues(_.size).toMap}")
    // grow the corpus by one English doc: the new draw differs from the
    // old by at most one member (the displaced k-th) — review stability
    val d2 = docsDir(docs :+ ((999L, prose(999, 30), "en")))
    val got2 = PipelineQueries.q110(spark, d2)
      .select("lang", "doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got2("de") == byLang("de"), "untouched stratum must not change")
    assert((byLang("en") -- got2("en")).size <= 1,
      s"one added doc displaced more than one pick")
  }

  // ------------------------------------------------------------- q112
  test("q112: KMV estimates land near truth above k and are exact below it") {
    // source A: 400 distinct docs; B: 400 distinct, 200 shared with A;
    // C: 30 docs (below k=64 -> exact path)
    val aDocs = (0 until 400).map(i => (i.toLong, s"adoc $i ${prose(i, 8)}", "A"))
    val bShared = (0 until 200).map(i =>
      (1000L + i, s"adoc $i ${prose(i, 8)}", "B")) // same TEXT as A's first 200
    val bOwn = (0 until 200).map(i => (2000L + i, s"bdoc $i ${prose(5000 + i, 8)}", "B"))
    val cDocs = (0 until 30).map(i => (3000L + i, s"cdoc $i ${prose(9000 + i, 8)}", "C"))
    val dir = docsDir(aDocs ++ bShared ++ bOwn ++ cDocs)
    spark.read.parquet(s"$dir/documents.parquet")
      .withColumnRenamed("lang", "source")
      .write.mode("overwrite").parquet(s"$dir/d2/documents.parquet")
    val got = PipelineQueries.q112(spark, s"$dir/d2")
      .select("source_a", "source_b", "est_a", "est_b", "est_union", "est_overlap")
      .as[(String, String, Double, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val ab = got(("A", "B"))
    // truth: |A| = 400, |B| = 400, |A∪B| = 600, overlap = 200; KMV at
    // k=64 has ~1/sqrt(62) ≈ 13% relative sd — allow ±35%
    assert(math.abs(ab._3 - 400) < 140, s"est_a ${ab._3} far from 400")
    assert(math.abs(ab._4 - 400) < 140, s"est_b ${ab._4} far from 400")
    assert(math.abs(ab._5 - 600) < 210, s"est_union ${ab._5} far from 600")
    assert(ab._6 > 0, s"disjoint estimate for 200 shared docs: ${ab._6}")
    // C is below k: its estimate is the exact distinct count
    assert(got(("A", "C"))._4 == 30.0, s"below-k source must be exact: ${got(("A", "C"))}")
    // exact union path for two below-k sketches: B∩C empty
    assert(got(("B", "C"))._4 == 30.0)
  }

  // ------------------------------------------------------------- q113
  test("q113: a planted 10x burst hour flags at z >= 3 and steady hours stay quiet") {
    import org.apache.spark.sql.functions._
    // 72 hours: ~steady 10±1 events/hour, hour 48 carries 100
    val rows = (0 until 72).flatMap { h =>
      val k = if (h == 48) 100 else 10 + (h % 3) - 1
      (0 until k).map(i => (h.toLong * 1000 + i, h.toLong * 3600 + i))
    }
    val dir = java.nio.file.Files.createTempDirectory("burst_ev").toString
    rows.toDF("event_id", "sec")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = PipelineQueries.q113(spark, dir)
      .select("n", "z", "burst").as[(Long, Double, Int)].collect()
    val bursts = got.filter(_._3 == 1)
    assert(bursts.length == 1 && bursts.head._1 == 100L,
      s"exactly the planted hour must flag: ${bursts.toSeq}")
    assert(bursts.head._2 >= 3.0)
    // steady hours sit well inside the fence
    assert(got.filter(_._1 <= 11).forall(_._2 < 3.0),
      "steady hours must not flag")
  }

  // ------------------------------------------------------------- q111
  test("q111: repeat counts hit the integer envelope and whole weights are exact") {
    val rows = PipelineQueries.q111(spark, sf0001)
      .select("source", "n_docs", "n_copies", "epoch_rate")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val w = PipelineQueries.EpochWeights.map(x => x._1 -> (x._2, x._3)).toMap
    rows.foreach { case (src, n, copies, rate) =>
      val (whole, thr) = w(src)
      assert(copies >= whole * n && copies <= (whole + 1) * n,
        s"$src copies $copies outside [$whole, ${whole + 1}] per doc")
      if (thr == "0000") // integral weight: every doc gets exactly `whole`
        assert(copies == whole * n && rate == whole.toDouble,
          s"$src integral weight must be exact: $copies vs ${whole * n}")
    }
  }

  // ------------------------------------------------------------- q192
  test("q192: pigeonhole blocking is complete — brute-force all-pairs hamming agrees; identical docs land at distance 0") {
    import org.apache.spark.sql.functions._
    val dup = prose(77, 60)
    val dir = docsDir(Seq(
      (1L, dup, "en"), (2L, dup, "en"), (3L, prose(78, 60), "en"),
      (4L, prose(79, 60), "en"), (5L, prose(80, 60), "en")))
    val craft = PipelineQueries.q192(spark, dir)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Long)].collect()
    assert(craft.contains((1L, 2L, 0L)), "verbatim duplicates must pair at hamming 0")
    graft.core.Pins.release()
    // completeness on real data: every brute-force pair within 3 is found
    val sigs = graft.core.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"),
        graft.functions.TextOps.simhash60Native(
          graft.functions.TextOps.tokens(col("text"))).as("sh"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val brute = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if h <= 3
    } yield (sigs(i)._1, sigs(j)._1, h.toLong)).toSet
    val got = PipelineQueries.q192(spark, sf0001)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Long)].collect().toSet
    graft.core.Pins.release()
    assert(got == brute, s"blocking missed ${(brute -- got).size} pairs / invented ${(got -- brute).size}")
  }

  test("q206: hand-counted grade on a crafted doc (negative numerator stays exact); real data matches a reference counter") {
    // "the cat sat. the dog ran!" -> 6 words, 2 sentences, 6 vowel
    // groups, 0 complex; fkg = (39*36 + 1180*12 - 1559*12) / 12 with a
    // NEGATIVE numerator -- the sign-safe band must still classify 0
    val docs = Seq(
      (1L, "the cat sat. the dog ran!", "en", "s", 25L),
      (2L, "extraordinary bureaucratic obfuscation complicates unintelligible documentation", "en", "s", 78L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_fk").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = PipelineQueries.q206(spark, dir)
      .select("doc_id", "n_words", "n_sents", "n_syll", "n_complex",
        "fkg_num", "fkg_den", "band")
      .as[(Long, Long, Long, Long, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 6L, 2L, 6L, 0L, 39L * 36 + 1180 * 12 - 1559 * 12, 12L, 0)),
      s"crafted simple doc: ${got(1L)}")
    // doc 2: 6 long words, 1 sentence (no terminal punctuation ->
    // clamped), every word >= 3 vowel groups -> band must be college
    assert(got(2L)._3 == 1L && got(2L)._5 == 6L && got(2L)._8 == 3,
      s"crafted college doc: ${got(2L)}")
    // reference recount on real data
    def syll(s0: String) = "[aeiouy]+".r.findAllIn(s0).length.toLong
    val ref = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().map { case (id, tx) =>
        val words = tx.split(" ", -1)
        val (nw, ns) = (words.length.toLong,
          math.max(1L, tx.count(c => c == '.' || c == '!' || c == '?').toLong))
        val sy = syll(tx)
        id -> ((nw, ns, sy, words.count(w => syll(w) >= 3).toLong,
          39 * nw * nw + 1180 * sy * ns - 1559 * ns * nw))
      }.toMap
    val real = PipelineQueries.q206(spark, sf0001)
      .select("doc_id", "n_words", "n_sents", "n_syll", "n_complex", "fkg_num")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(real == ref, s"reference counter mismatch: ${
      (real.keySet ++ ref.keySet).filter(k => real.get(k) != ref.get(k)).take(3)}")
  }

  test("q214: unclipped brightness copies land at hamming 0; blocking finds exactly the quadratic truth") {
    // vec 0: mid-gray gradient far from 255 — its +30 variant clips
    // nothing, so affine invariance demands hamming EXACTLY 0;
    // vec 10: pixels near the ceiling — clipping flips bits
    def emb(f: Int => Double) = (0 until 64).map(i => f(i).toFloat).toArray
    val vecs = Seq(
      (0L, emb(i => (i % 16) / 64.0 - 0.5), 0),   // grays ~64..110
      (10L, emb(i => 0.85 + (i % 8) / 64.0), 1),  // grays ~236..251
      (3L, emb(i => ((i * 37) % 64) / 32.0 - 1.0), 2)) // scattered
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft_ah").toString
    vecs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = PipelineQueries.q214(spark, dir)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    graft.core.Pins.release()
    assert(got.get((0L, 1000000L)).contains(0L),
      s"unclipped +30 copy must hash identically: $got")
    // real data: quadratic replay over base + variant signatures
    val sigs = Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().flatMap { case (id, e) =>
        val g0 = e.padTo(64, 0f).take(64).map { x =>
          val q = math.floor((x.toDouble + 1.0) * 127.5).toLong
          math.max(0L, math.min(255L, q)).toInt
        }.toArray
        def sig(g: Array[Int]): (Long, Long) = {
          val sum = g.map(_.toLong).sum
          def half(lo: Int): Long = (0 until 32).map { j =>
            if (64L * g(lo + j) > sum) 1L << j else 0L }.sum
          (half(32), half(0))
        }
        val b0 = sig(g0)
        Seq((id, b0)) ++ (if (id % 10 == 0)
          Seq((id + 1000000L, sig(g0.map(v => math.min(255, v + 30))))) else Nil)
      }
    val brute = (for {
      i <- sigs.indices; j <- sigs.indices
      if sigs(i)._1 < sigs(j)._1
      h = java.lang.Long.bitCount(sigs(i)._2._1 ^ sigs(j)._2._1) +
        java.lang.Long.bitCount(sigs(i)._2._2 ^ sigs(j)._2._2)
      if h <= 3
    } yield (sigs(i)._1, sigs(j)._1, h.toLong)).toSet
    val real = PipelineQueries.q214(spark, sf0001)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Long)].collect().toSet
    graft.core.Pins.release()
    assert(real == brute,
      s"blocking missed ${(brute -- real).size} / invented ${(real -- brute).size}")
    assert(brute.nonEmpty, "the planted variants must produce pairs")
  }

  test("q230: a planted collocation tops the lift ranking; real data matches a BigInt brute-force replay") {
    // brute-force replay shared by both checks
    def replay(texts: Seq[String]): Seq[(String, Long, Long, Long, Long)] = {
      val toks = texts.flatMap(_.split(" ").filter(_.nonEmpty))
      val uni = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val u = BigInt(toks.size)
      val bgs = texts.flatMap(t0 => t0.split(" ").filter(_.nonEmpty)
        .sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
      val cb = bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val b = BigInt(bgs.size)
      cb.toSeq.map { case ((w1, w2), c) =>
        val ppm = (BigInt(c) * u * u * 1000000) / (b * uni(w1) * uni(w2))
        (s"$w1 $w2", c, uni(w1), uni(w2), ppm.toLong)
      }.sortBy(r => (-r._5, r._1)).take(20)
    }
    // planted: "alpha beta" always adjacent; "gamma"/"delta" common but
    // never adjacent to each other
    val texts = Seq.fill(5)("gamma alpha beta delta") ++
      Seq.fill(5)("delta gamma gamma delta")
    val dir = java.nio.file.Files.createTempDirectory("graft_lift").toString
    texts.zipWithIndex.map { case (t0, i) => (i.toLong, t0, "en", "s", t0.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = PipelineQueries.q230(spark, dir)
      .select("bigram", "cb", "c1", "c2", "lift_ppm")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    graft.core.Pins.release()
    assert(got == replay(texts), s"planted replay diverges: ${got.take(3)}")
    assert(got.head._1 == "alpha beta",
      s"the always-adjacent pair must rank first: ${got.head}")
    // real data
    val corpus = graft.core.Tables.load(spark, sf0001, "documents")
      .select("text").as[String].collect().toSeq
    val real = PipelineQueries.q230(spark, sf0001)
      .select("bigram", "cb", "c1", "c2", "lift_ppm")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    graft.core.Pins.release()
    assert(real == replay(corpus), "real-data lift replay diverges")
  }
}
