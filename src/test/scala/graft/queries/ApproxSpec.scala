package graft.queries

import graft.SparkSpec

/** The sketch shelf: declared q47/q71/q79 are deterministic
  * (md5-KMV / bottom-k / Count-Min — oracle-exact in the gate); the
  * engine-native HLL++/KLL/Misra-Gries fast paths ([[EngineNative]])
  * have no cross-engine oracle, so their estimates are bracketed
  * against exact answers here instead.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("EngineNative HLL++ estimates stay within 10% of exact") {
    val got = EngineNative.q47Hll(spark, sf0001)
      .select("event_type", "approx_users")
      .as[(String, Long)].collect().toMap
    val exact = graft.core.Tables.load(spark, sf0001, "events")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (et, est) =>
      val ex = exact(et).toDouble
      assert(math.abs(est - ex) / ex <= 0.10, s"$et: $est vs $ex")
    }
  }

  test("sf0.1: HLL++ estimates fall within 2x the configured 2% rsd of exact") {
    val dir = "/root/testdata/sf0.1"
    val got = EngineNative.q47Hll(spark, dir)
      .select("event_type", "approx_users")
      .as[(String, Long)].collect().toMap
    val exact = graft.core.Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got.keySet == exact.keySet)
    // rsd = 0.02; HLL++ error is probabilistic, so gate at 2σ — tight
    // enough to catch a broken sketch, loose enough to never flake on
    // this fixed dataset
    got.foreach { case (et, est) =>
      val ex = exact(et).toDouble
      assert(math.abs(est - ex) / ex <= 0.04, s"$et: $est vs $ex exceeds 2x rsd")
    }
  }

  test("q47 KMV estimates bracket exact; small groups exact; carries the exact n") {
    val got = PipelineQueries.q47(spark, sf0001)
      .as[(String, Double, Long)].collect()
      .map { case (t, e, n) => t -> ((e, n)) }.toMap
    val exact = graft.core.Tables.load(spark, sf0001, "events")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("d"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
      .map { case (t, d, n) => t -> ((d, n)) }.toMap
    assert(got.keySet == exact.keySet)
    // KMV RSE ~ 1/sqrt(k-2) ≈ 8.9% at k=128; fixed data → deterministic,
    // gate at 3σ. Groups with < k distinct users must be EXACT.
    got.foreach { case (et, (est, n)) =>
      val (d, exN) = exact(et)
      assert(n == exN, s"$et: n $n vs $exN")
      if (d < 128) assert(est == d.toDouble, s"$et: small group must be exact, $est vs $d")
      else assert(math.abs(est - d) / d <= 0.27, s"$et: $est vs $d")
    }
  }

  test("q156 KMV estimates stay within the k=64 error band of exact") {
    val got = PipelineQueries.q156(spark, sf0001)
      .as[(String, Double)].collect().toMap
    val exact = graft.core.Tables.load(spark, sf0001, "events")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got.keySet == exact.keySet)
    // KMV relative standard error is ~1/sqrt(k-2) ≈ 12.7% at k=64; the
    // fixed dataset makes this deterministic, gate at 3σ. Groups with
    // fewer than k distinct users must be EXACT (sketch = value set).
    got.foreach { case (et, est) =>
      val ex = exact(et).toDouble
      if (ex < 64) assert(est == ex, s"$et: small group must be exact, $est vs $ex")
      else assert(math.abs(est - ex) / ex <= 0.38, s"$et: $est vs $ex")
    }
  }

  test("KmvSketchAgg dedups inside the aggregate (pre-distinct-free)") {
    import org.apache.spark.sql.functions._
    // duplicated input values must not eat sketch slots: sketch of the
    // raw (duplicated) stream == sketch of the distinct stream
    val raw = (1 to 200).flatMap(i => Seq.fill(3)(i)).toDF("v")
      .select(lit("g").as("g"), md5(col("v").cast("string")).as("h"))
    val skRaw = raw.groupBy("g")
      .agg(graft.operators.TopK.kmvSketch(64)(col("h")).as("hs"))
      .as[(String, Seq[String])].collect().head._2
    val skDistinct = raw.distinct().groupBy("g")
      .agg(graft.operators.TopK.kmvSketch(64)(col("h")).as("hs"))
      .as[(String, Seq[String])].collect().head._2
    assert(skRaw == skDistinct)
    assert(skRaw.length == 64 && skRaw == skRaw.distinct.sorted)
  }

  test("EngineNative KLL quantiles bracket the exact percentiles") {
    import org.apache.spark.sql.functions._
    val got = EngineNative.q71Kll(spark, sf0001)
      .select("event_type", "p50", "p95")
      .as[(String, Double, Double)].collect().map { case (t, a, b) => t -> ((a, b)) }.toMap
    val exact = graft.core.Tables.load(spark, sf0001, "events")
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"))
      .as[(String, Double, Double)].collect().map { case (t, a, b) => t -> ((a, b)) }.toMap
    assert(got.keySet == exact.keySet)
    // accuracy 10000 → rank error <= n/10000; on these group sizes the
    // estimate must be a REAL value within a generous relative band
    got.foreach { case (et, (a50, a95)) =>
      val (e50, e95) = exact(et)
      assert(math.abs(a50 - e50) / math.max(e50.abs, 1e-9) <= 0.05, s"$et p50: $a50 vs $e50")
      assert(math.abs(a95 - e95) / math.max(e95.abs, 1e-9) <= 0.05, s"$et p95: $a95 vs $e95")
    }
  }

  test("q71 sample quantiles: bit-for-bit sample replay; small groups exact; rank brackets") {
    import org.apache.spark.sql.functions._
    val got = PipelineQueries.q71(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map { case (t, n, p25, p50, p75, p95) => t -> ((n, Seq(p25, p50, p75, p95))) }.toMap
    val ev = graft.core.Tables.load(spark, sf0001, "events")
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(String, Long, Long)].collect()
    val byType = ev.groupBy(_._1)
    assert(got.keySet == byType.keySet)
    val grid = Seq(0.25, 0.50, 0.75, 0.95)
    byType.foreach { case (et, rows) =>
      val (n, ps) = got(et)
      assert(n == rows.length.toLong)
      // independent JVM replay of the sampler (the q46/q110 md5 seam):
      // bottom-512 by md5 hex, tie-broken by cents — bit-for-bit
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(id: Long) = md.digest(s"kll71|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val sample = rows.map { case (_, id, c) => (h(id), c) }
        .sortBy(identity).take(512).map(_._2).sorted
      val m = sample.length
      grid.zip(ps).foreach { case (p, v) =>
        assert(v == sample(math.ceil(m * p).toInt - 1), s"$et p$p replay")
      }
      // estimator quality: sampled order statistics bracket the exact
      // percentiles (fixed data → deterministic; generous 3σ rank band
      // at k=512 → ~1.5/sqrt(512) ≈ 0.066 per tail)
      val exactSorted = rows.map(_._3).sorted
      if (rows.length <= 512)
        grid.zip(ps).foreach { case (p, v) =>
          assert(v == exactSorted(math.ceil(rows.length * p).toInt - 1),
            s"$et: small group must be exact at p$p")
        }
      else {
        def rankOf(v: Long) = exactSorted.count(_ <= v).toDouble / rows.length
        grid.zip(ps).foreach { case (p, v) =>
          assert(math.abs(rankOf(v) - p) <= 0.08, s"$et p$p rank ${rankOf(v)}")
        }
      }
    }
  }

  test("q247 sample quantiles bracket exact; small groups exact; bit-for-bit sample replay") {
    import org.apache.spark.sql.functions._
    val got = PipelineQueries.q247(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
      .map { case (t, n, p50, p95) => t -> ((n, p50, p95)) }.toMap
    val ev = graft.core.Tables.load(spark, sf0001, "events")
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(String, Long, Long)].collect()
    val byType = ev.groupBy(_._1)
    assert(got.keySet == byType.keySet)
    byType.foreach { case (et, rows) =>
      val (n, p50, p95) = got(et)
      assert(n == rows.length.toLong)
      // independent JVM replay of the sampler (the q46/q110 md5 seam):
      // bottom-256 by md5 hex, tie-broken by cents — bit-for-bit
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(id: Long) = md.digest(s"qs|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val sample = rows.map { case (_, id, c) => (h(id), c) }
        .sortBy(identity).take(256).map(_._2).sorted
      val m = sample.length
      assert(p50 == sample(math.ceil(m * 0.5).toInt - 1), s"$et p50 replay")
      assert(p95 == sample(math.ceil(m * 0.95).toInt - 1), s"$et p95 replay")
      // estimator quality: sampled order statistics bracket the exact
      // percentiles (fixed data → deterministic; generous 3σ rank band)
      val exactSorted = rows.map(_._3).sorted
      if (rows.length <= 256) {
        assert(p50 == exactSorted(math.ceil(rows.length * 0.5).toInt - 1),
          s"$et: small group must be exact")
      } else {
        def rankOf(v: Long) = exactSorted.count(_ <= v).toDouble / rows.length
        assert(math.abs(rankOf(p50) - 0.5) <= 0.12, s"$et p50 rank ${rankOf(p50)}")
        assert(math.abs(rankOf(p95) - 0.95) <= 0.12, s"$et p95 rank ${rankOf(p95)}")
      }
    }
  }

  test("q79 Count-Min top-5: est >= true always; JVM sketch replay on one language") {
    import org.apache.spark.sql.functions._
    val rows = PipelineQueries.q79(spark, sf0001)
      .as[(String, Long, String, Long)].collect()
    assert(rows.nonEmpty)
    // exact per-(lang, term) counts, computed independently
    val truth = graft.core.Tables.load(spark, sf0001, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .groupBy("lang", "term").count()
      .as[(String, String, Long)].collect()
      .map { case (l, t, c) => (l, t) -> c }.toMap
    // one-sided CMS guarantee: every reported estimate >= the true count
    rows.foreach { case (l, _, t, est) =>
      assert(est >= truth((l, t)), s"($l,$t): est $est < true ${truth((l, t))}")
    }
    // ranks are 1..5 per language, estimates non-increasing within a language
    rows.groupBy(_._1).foreach { case (l, rs) =>
      assert(rs.map(_._2).sorted.toList == (1L to rs.length.toLong).toList, s"$l ranks")
      val ests = rs.sortBy(_._2).map(_._4).toList
      assert(ests == ests.sorted.reverse, s"$l estimates must be non-increasing")
    }
    // bit-for-bit JVM replay of the d=4 × 256 sketch for one language:
    // est(x) = min_j cells(j, md5(j|lang|term)[0,2))
    val md = java.security.MessageDigest.getInstance("MD5")
    def b(j: Int, lt: String) = md.digest(s"$j|$lt".getBytes("UTF-8"))
      .take(1).map("%02x".format(_)).mkString
    val allTerms = truth.toSeq // (lang, term) -> cnt, across ALL languages
    val cells = (0 until 4).map { j =>
      j -> allTerms.groupBy { case ((l, t), _) => b(j, s"$l|$t") }
        .map { case (bk, xs) => bk -> xs.map(_._2).sum }
    }.toMap
    val lang0 = rows.head._1
    rows.filter(_._1 == lang0).foreach { case (l, _, t, est) =>
      val replay = (0 until 4).map(j => cells(j).getOrElse(b(j, s"$l|$t"), 0L)).min
      assert(est == replay, s"($l,$t): est $est vs replay $replay")
    }
  }

  test("MinKByLongAgg: partition-independent, equals sort-take, merge-order-blind") {
    val agg = new graft.operators.MinKByLongAgg(3)
    val rnd = new scala.util.Random(42)
    val rows = Vector.fill(500)((rnd.nextLong() % 1000, rnd.nextLong() % 1000))
    val expected = rows.distinct.sortBy(identity).take(3)
    // any partitioning of the stream, folded then merged in any order,
    // must equal sort-take over the whole stream (duplicate (k, id)
    // pairs may each enter the buffer; take(3) of the sorted multiset
    // equals take(3) of the sorted distinct set only when the top is
    // duplicate-free, so compare against the raw sorted stream)
    val exp = rows.sortBy(identity).take(3)
    for (seed <- 1 to 5) {
      val r2 = new scala.util.Random(seed)
      val parts = rows.groupBy(_ => r2.nextInt(7)).values.toList
      val folded = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      val merged = r2.shuffle(folded).reduce(agg.merge)
      assert(agg.finish(merged).take(3) == exp, s"seed=$seed")
    }
    assert(expected.nonEmpty) // fixture sanity
  }

  test("q267 Merkle fingerprint: order-invariant, single-doc-change-sensitive") {
    import org.apache.spark.sql.functions._
    val base = PipelineQueries.q267(spark, sf0001)
      .select("source", "fingerprint").as[(String, String)].collect().toMap
    // row order must not matter: same data through a shuffled lineage
    val shuffled = graft.core.Tables.load(spark, sf0001, "documents")
      .orderBy(md5(concat(lit("shuf|"), col("doc_id").cast("string"))))
    val dir2 = java.nio.file.Files.createTempDirectory("fp").toString
    shuffled.write.parquet(s"$dir2/documents.parquet")
    val reord = PipelineQueries.q267(spark, dir2)
      .select("source", "fingerprint").as[(String, String)].collect().toMap
    assert(reord == base, "fingerprint must be row-order-invariant")
    // a single edited document must flip exactly its source's fingerprint
    val edited = graft.core.Tables.load(spark, sf0001, "documents")
      .withColumn("text", when(col("doc_id") === 0, concat(col("text"), lit(" x")))
        .otherwise(col("text")))
    val dir3 = java.nio.file.Files.createTempDirectory("fp2").toString
    edited.write.parquet(s"$dir3/documents.parquet")
    val src0 = graft.core.Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id") === 0).select("source").as[String].head()
    val changed = PipelineQueries.q267(spark, dir3)
      .select("source", "fingerprint").as[(String, String)].collect().toMap
    assert(changed(src0) != base(src0), "edit must flip the source fingerprint")
    (base.keySet - src0).foreach(k => assert(changed(k) == base(k), s"$k must be unchanged"))
  }

  test("q272 power iteration recovers a planted principal direction") {
    import org.apache.spark.sql.functions._
    // corpus = t·u + small fixed cross-noise: the top eigenvector is u
    val rnd = new scala.util.Random(13)
    val u = Array.tabulate(64)(j => math.sin(j + 1.0)) // fixed direction
    val un = math.sqrt(u.map(x => x * x).sum)
    val rows = (0 until 400).map { i =>
      val t = (i % 21 - 10).toDouble // symmetric spread along u
      val v = Array.tabulate(64)(j =>
        (t * u(j) / un + 0.02 * rnd.nextGaussian()).toFloat)
      (i.toLong, v, i % 3)
    }
    val dir = java.nio.file.Files.createTempDirectory("pca").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = PipelineQueries.q272(spark, dir)
      .select("dim", "v_e4", "lambda_n2").as[(Long, Long, Long)].collect()
    assert(got.length == 64 && got.map(_._1).toSeq == (1L to 64L))
    val v = got.sortBy(_._1).map(_._2.toDouble)
    val dot = v.zip(u).map { case (a, b) => a * b / un }.sum
    val cos = math.abs(dot) / math.sqrt(v.map(x => x * x).sum)
    assert(cos > 0.99, s"recovered direction cos=$cos")
    assert(got.head._3 > 0L, "Rayleigh quotient of a PSD matrix")
  }
}
