package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** All-pairs similarity joins as tiled brute-force kernels.
  *
  * Relational formulations of an N² similarity join (pair-explode +
  * aggregate, or crossJoin + per-pair expression) materialize every
  * candidate pair as a row — the shuffle/copy cost dwarfs the arithmetic.
  * These kernels instead broadcast one side as primitive arrays and
  * stream the other side through `mapPartitions` with a tight JVM loop,
  * emitting only the pairs that pass the threshold (`mapPartitions` as a
  * deliberate last resort per the custom-operator ladder: the semantics
  * — *emit only matches of an N² scan* — are not expressible without
  * materializing the N² intermediate).
  *
  * Scale path (100 TB): this is the one-tile-row special case of a
  * block-partitioned similarity join — tile both sides, broadcast one
  * tile of B per task, loop. Pair count stays N²; the fix at scale is
  * candidate pruning first (MinHash-LSH bands for Jaccard, sign-bucket
  * LSH for cosine — q19/q23), then this kernel verifies candidates
  * exactly.
  *
  * Rounding replicates Spark's `Round` on DoubleType exactly
  * (`BigDecimal.valueOf(x).setScale(s, HALF_UP)`), so results stay
  * bit-identical to the declarative formulation and the DuckDB oracle.
  */
object SimilarityJoin {

  def round4(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(4, RoundingMode.HALF_UP).doubleValue()

  /** All pairs (a < b) with cosine similarity ≥ threshold (rounded to
    * 4 dp first, matching the declarative/oracle filter).
    *
    * @param emb (id, vector) rows; vectors must be equal-length
    */
  def cosinePairs(emb: Dataset[(Long, Array[Double])], threshold: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val all = emb.collect().sortBy(_._1)
    val norms = all.map { case (_, v) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((all, norms))
    // The scanned side arrives in file-granularity partitions (often 1);
    // spread it across the cluster so the kernel actually parallelizes.
    emb.repartition(spark.sparkContext.defaultParallelism).mapPartitions { it =>
      val (bRows, bNorms) = bc.value
      it.flatMap { case (aId, av) =>
        var an = 0.0
        var i = 0
        while (i < av.length) { an += av(i) * av(i); i += 1 }
        val aNorm = math.sqrt(an)
        val out = Seq.newBuilder[(Long, Long, Double)]
        var j = 0
        while (j < bRows.length) {
          val (bId, bv) = bRows(j)
          if (bId > aId) {
            var s = 0.0
            var k = 0
            val n = math.min(av.length, bv.length)
            while (k < n) { s += av(k) * bv(k); k += 1 }
            val sim = round4(s / (aNorm * bNorms(j)))
            if (sim >= threshold) out += ((aId, bId, sim))
          }
          j += 1
        }
        out.result()
      }
    }.toDF("a_id", "b_id", "sim")
  }

  /** All pairs (a < b) with exact Jaccard ≥ threshold over per-row token
    * sets, plus the intersection size. Sets are dictionary-encoded to
    * sorted int arrays on the driver (the dictionary is |distinct
    * shingles| — catalog-sized, not corpus-sized), and intersections run
    * as sorted-array merges.
    */
  def jaccardPairs(sets: Dataset[(Long, Seq[String])], threshold: Double): DataFrame = {
    val spark = sets.sparkSession
    import spark.implicits._
    val all = sets.collect().sortBy(_._1)
    val dict = scala.collection.mutable.HashMap.empty[String, Long]
    val encoded = all.map { case (id, ss) =>
      val a = ss.distinct.map(s => dict.getOrElseUpdate(s, dict.size.toLong)).toArray
      java.util.Arrays.sort(a)
      (id, a)
    }
    jaccardKernel(spark, encoded, threshold)
  }

  /** [[jaccardPairs]] over pre-hashed sets: elements are 64-bit shingle
    * hashes computed Spark-side (e.g. `xxhash64` inside `transform` —
    * codegen'd), so the driver collects primitive long arrays instead of
    * materializing hundreds of thousands of String objects (~5× faster
    * end-to-end). Exact up to 64-bit hash collisions (~N²/2⁶⁵; the
    * sf0.01 oracle gate would catch one).
    */
  def jaccardPairsHashed(sets: Dataset[(Long, Array[Long])], threshold: Double): DataFrame = {
    val spark = sets.sparkSession
    val encoded = sets.collect().sortBy(_._1)
    jaccardKernel(spark, encoded, threshold)
  }

  /** 64-bit FNV-1a over a word n-gram (tokens joined by a single space,
    * matching the string-shingle identity). */
  private def fnvShingle(toks: Array[String], start: Int, n: Int): Long = {
    var h = 0xcbf29ce484222325L
    var w = 0
    while (w < n) {
      if (w > 0) { h ^= ' '.toLong; h *= 0x100000001b3L }
      val t = toks(start + w)
      var c = 0
      while (c < t.length) { h ^= t.charAt(c).toLong; h *= 0x100000001b3L; c += 1 }
      w += 1
    }
    h
  }

  /** [[jaccardPairs]] straight from text: word n-gram shingle sets are
    * built and FNV-64-hashed inside `mapPartitions` (one tight pass, no
    * per-element lambda dispatch, no intermediate shingle strings) —
    * the shingle identity is internal to the computation, so any
    * injective-enough encoding preserves exact Jaccard (collisions
    * ~N²/2⁶⁵). ~10× faster than building shingle strings through
    * higher-order functions at 5k docs.
    */
  def jaccardPairsText(docs: Dataset[(Long, String)], n: Int,
                       threshold: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val encoded = docs.mapPartitions(_.map { case (id, text) =>
      val toks = text.split(' ')
      val m = math.max(toks.length - (n - 1), 0)
      val hs = new Array[Long](m)
      var i = 0
      while (i < m) { hs(i) = fnvShingle(toks, i, n); i += 1 }
      val distinct = hs.distinct
      java.util.Arrays.sort(distinct)
      (id, distinct)
    }).collect().sortBy(_._1)
    jaccardKernel(spark, encoded, threshold)
  }

  private def jaccardKernel(spark: org.apache.spark.sql.SparkSession,
                            encoded: Array[(Long, Array[Long])],
                            threshold: Double): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(encoded)
    // Row i scans rows i+1..N, so work decreases linearly with i:
    // round-robin the indices across partitions to balance the triangle.
    spark.createDataset(encoded.indices.toSeq)
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
      val rows = bc.value
      it.flatMap { ai =>
        val (aId, av) = rows(ai)
        val out = Seq.newBuilder[(Long, Long, Long, Double)]
        var j = ai + 1
        while (j < rows.length) {
          val (bId, bv) = rows(j)
          // The emitted filter is on round4(jac) ≥ t, so jac as low as
          // t − 5e-5 can round up into the result: derive the count bound
          // from that widened threshold. jac ≥ t' needs common ≥
          // ceil(t'(na+nb)/(1+t')); skip the merge when sizes can't reach
          // it, abort mid-merge once the remainder can't either.
          val tEff = math.max(threshold - 5e-5, 0.0)
          val cMin = math.ceil(tEff * (av.length + bv.length) / (1 + tEff) - 1e-9).toInt
          if (math.min(av.length, bv.length) >= cMin) {
            var x = 0; var y = 0; var common = 0
            var live = true
            while (live && x < av.length && y < bv.length) {
              val c = java.lang.Long.compare(av(x), bv(y))
              if (c == 0) { common += 1; x += 1; y += 1 }
              else if (c < 0) x += 1
              else y += 1
              if (common + math.min(av.length - x, bv.length - y) < cMin) live = false
            }
            if (common >= cMin) {
              val jac = round4(common.toDouble / (av.length + bv.length - common))
              if (jac >= threshold) out += ((aId, bId, common.toLong, jac))
            }
          }
          j += 1
        }
        out.result()
      }
    }.toDF("a_id", "b_id", "common", "jac")
  }
}
