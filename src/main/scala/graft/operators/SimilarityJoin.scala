package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** All-pairs similarity joins as distributed tiled brute-force kernels.
  *
  * Relational formulations of an N² similarity join (pair-explode +
  * aggregate, or crossJoin + per-pair expression) materialize every
  * candidate pair as a row — the shuffle/copy cost dwarfs the arithmetic.
  * These kernels instead run per-tile tight JVM loops under
  * [[TiledSelfJoin]]: rows shuffle once into block-pair tiles, each task
  * compares its two blocks and emits only the pairs that pass the
  * threshold (`mapPartitions` as a deliberate last resort per the
  * custom-operator ladder: the semantics — *emit only matches of an N²
  * scan* — are not expressible without materializing the N²
  * intermediate). The driver never sees the corpus; per-task memory is
  * 2·N/b rows with b = `graft.similarity.blocks`.
  *
  * Scale path (100 TB): the comparison count stays N²/2 — tiling makes
  * it distributed, not sub-quadratic. Candidate pruning first (MinHash
  * LSH bands for Jaccard, sign-bucket LSH for cosine — q19/q23) and
  * these kernels as the exact-verify tier over candidates.
  *
  * Rounding replicates Spark's `Round` on DoubleType exactly
  * (`BigDecimal.valueOf(x).setScale(s, HALF_UP)`), so results stay
  * bit-identical to the declarative formulation and the DuckDB oracle.
  */
object SimilarityJoin {

  def round4(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(4, RoundingMode.HALF_UP).doubleValue()

  /** All pairs (a_id < b_id) with cosine similarity ≥ threshold (rounded
    * to 4 dp first, matching the declarative/oracle filter).
    *
    * @param emb (id, vector) rows; vectors must be equal-length
    */
  def cosinePairs(emb: Dataset[(Long, Array[Double])], threshold: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val blocks = TiledSelfJoin.defaultBlocks(spark)
    spark.createDataset(TiledSelfJoin(emb.rdd, blocks)(cosineTile(threshold)))
      .toDF("a_id", "b_id", "sim")
  }

  /** Tile kernel: norms once per buffer, then the tight dot-product loop.
    * Shared with [[graft.plans.CosineSelfJoinExec]].
    *
    * Emits pairs LAZILY from (i, j) cursor state — per-task memory is the
    * two input blocks plus one pending pair, independent of how many
    * pairs pass. With a low threshold or a near-dup-dense corpus the
    * output is O((N/b)²); buffering it per task (the previous
    * `Seq.newBuilder` form) was the engine's last unbounded-memory path.
    * Downstream consumers (shuffle writers, UnsafeProjection) pull
    * one pair at a time.
    */
  private[graft] def cosineTile(threshold: Double)(
      left: Array[(Long, Array[Double])], right: Array[(Long, Array[Double])],
      diag: Boolean): Iterator[(Long, Long, Double)] = {
    def norms(rows: Array[(Long, Array[Double])]): Array[Double] =
      rows.map { case (_, v) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        math.sqrt(s)
      }
    val ln = norms(left)
    val rn = if (diag) ln else norms(right)
    new scala.collection.AbstractIterator[(Long, Long, Double)] {
      private var i = 0
      private var j = if (diag) 1 else 0
      private var ready = false
      private var aOut = 0L; private var bOut = 0L; private var simOut = 0.0
      private def advance(): Unit = {
        while (!ready && i < left.length) {
          if (j >= right.length) {
            i += 1
            j = if (diag) i + 1 else 0
          } else {
            val (aId, av) = left(i)
            val (bId, bv) = right(j)
            // duplicate ids (both land in the same block) must not emit
            // (id, id) self-pairs — the contract is strictly a_id < b_id
            if (aId != bId) {
              var s = 0.0
              var k = 0
              val n = math.min(av.length, bv.length)
              while (k < n) { s += av(k) * bv(k); k += 1 }
              val sim = round4(s / (ln(i) * rn(j)))
              if (sim >= threshold) {
                if (aId < bId) { aOut = aId; bOut = bId } else { aOut = bId; bOut = aId }
                simOut = sim
                ready = true
              }
            }
            j += 1
          }
        }
      }
      override def hasNext: Boolean = { advance(); ready }
      override def next(): (Long, Long, Double) = {
        advance()
        if (!ready) Iterator.empty.next()
        ready = false
        (aOut, bOut, simOut)
      }
    }
  }

  /** All pairs (a_id < b_id) with exact integer squared-L2 distance
    * ≤ eps2 over quantized ARRAY<BIGINT> vectors — the ε-NEIGHBOR graph
    * builder of the density-clustering family (q200's DBSCAN): same
    * tiled brute-force harness as [[cosinePairs]], but the per-pair
    * arithmetic is ALL-INTEGER (quantize once, then no float ever
    * exists — the threshold compare cannot diverge engines) and the
    * inner loop EARLY-EXITS the moment the running sum clears eps2
    * (most pairs die in the first dimensions, so the effective per-pair
    * cost tracks the ε-ball density, not the dimension count). Exact
    * and quadratic by design — the production path prunes candidates
    * first (sign-LSH / IVF cells) and runs this as the verify tier. */
  def sqDistPairs(emb: Dataset[(Long, Array[Long])], eps2: Long): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val blocks = TiledSelfJoin.defaultBlocks(spark)
    spark.createDataset(TiledSelfJoin(emb.rdd, blocks)(sqDistTile(eps2)))
      .toDF("a_id", "b_id", "d2")
  }

  private def sqd(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0; val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** EXACT ε-pairs via ball-cover anchor pruning — the same output
    * relation as [[sqDistPairs]] (every pair a_id < b_id with squared
    * distance ≤ eps2) without the N²/2 comparison count. Mechanism:
    * `nAnchors` vectors are picked deterministically (smallest
    * md5("anc|"+id) — data-independent spread, no RNG), every vector
    * computes its anchor distances scan-locally and homes to the
    * nearest; per home cell the radius r_j = max member distance is
    * folded; and a vector x probes cell j only when d(x, a_j) ≤ ε +
    * r_j. COMPLETENESS is the triangle inequality, not a heuristic:
    * for any qualifying pair (x, y), d(x, a_home(y)) ≤ d(x, y) +
    * d(y, a_home(y)) ≤ ε + r_home(y), so x always reaches y's cell
    * and each pair is found exactly once (via the lower id probing
    * the higher id's home). The probe bound is computed in exact long
    * arithmetic plus a ceil'd cross term (conservative by
    * construction — an over-wide bound only admits extra candidates;
    * the final exact eps2 filter decides). Work: N·nAnchors anchor
    * distances + Σ_cells |probers_j|·|members_j| exact comparisons —
    * on clustered data orders of magnitude under N²/2; the all-pairs
    * tile kernel remains the eval tier for the pathological case
    * (every cell reachable from everywhere), exactly the IVF/LSH →
    * verify split the ANN family uses, but here the prune is
    * RECALL-LOSSLESS so it can back a declared exact query (q200).
    * Scale shape: anchors are a model-sized driver artifact (the
    * centroid precedent); assignment is scan-local; the cell join
    * shuffles on the cell id with per-cell volumes bounded by the
    * cover — the natural partitioning for a 100 TB ε-graph build. */
  def sqDistPairsPruned(emb: Dataset[(Long, Array[Long])], eps2: Long,
                        nAnchors: Int = 32): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val anchors = emb.toDF("id", "v")
      .withColumn("hk", md5(concat(lit("anc|"), col("id").cast("string"))))
      .orderBy(col("hk"), col("id")).limit(nAnchors)
      .select(col("id"), col("v")).as[(Long, Array[Long])]
      .collect().sortBy(_._1).map(_._2)
    val bc = spark.sparkContext.broadcast(anchors)
    val assigned = graft.core.Pins.pin(emb.map { case (id, v) =>
      val as = bc.value
      val d2s = Array.tabulate(as.length)(j => sqd(v, as(j)))
      var h = 0; var j = 1
      while (j < as.length) { if (d2s(j) < d2s(h)) h = j; j += 1 }
      (id, v, d2s, h)
    }.toDF("id", "v", "d2s", "home"))
    // cell radius r2_j = max member d2 to its home anchor; the probe
    // bound d ≤ ε + r ⟺ d² ≤ ε² + r² + 2εr uses exact longs for the
    // square terms and a ceil'd double for the cross term (+4 ulp
    // headroom) — conservative, never excluding
    val cells = assigned.groupBy(col("home").as("j"))
      .agg(max(expr("element_at(d2s, home + 1)")).as("r2"))
      .withColumn("bnd", col("r2") + lit(eps2) +
        ceil(lit(2.0) * sqrt(col("r2").cast("double")) *
          sqrt(lit(eps2.toDouble))).cast("long") + lit(4L))
      .select(col("j"), col("bnd"))
    val probes = assigned
      .select(col("id").as("a_id"), col("v").as("av"),
        posexplode(col("d2s")).as(Seq("j", "d2a")))
      .join(broadcast(cells), Seq("j"))
      .filter(col("d2a") <= col("bnd"))
      .select(col("j"), col("a_id"), col("av"))
    val members = assigned.select(col("home").as("j"),
      col("id").as("b_id"), col("v").as("bv"))
    probes.join(members, Seq("j"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("d2", expr(
        "aggregate(zip_with(av, bv, (x, y) -> (x - y) * (x - y)), 0L, (acc, e) -> acc + e)"))
      .filter(col("d2") <= lit(eps2))
      .select(col("a_id"), col("b_id"), col("d2"))
  }

  /** Tile kernel for [[sqDistPairs]]: lazy cursor emission (the
    * [[cosineTile]] memory contract), integer accumulation, eps2
    * early-exit. */
  private[graft] def sqDistTile(eps2: Long)(
      left: Array[(Long, Array[Long])], right: Array[(Long, Array[Long])],
      diag: Boolean): Iterator[(Long, Long, Long)] =
    new scala.collection.AbstractIterator[(Long, Long, Long)] {
      private var i = 0
      private var j = if (diag) 1 else 0
      private var ready = false
      private var aOut = 0L; private var bOut = 0L; private var d2Out = 0L
      private def advance(): Unit = {
        while (!ready && i < left.length) {
          if (j >= right.length) {
            i += 1
            j = if (diag) i + 1 else 0
          } else {
            val (aId, av) = left(i)
            val (bId, bv) = right(j)
            if (aId != bId) {
              var s = 0L
              var k = 0
              val n = math.min(av.length, bv.length)
              while (k < n && s <= eps2) {
                val dk = av(k) - bv(k); s += dk * dk; k += 1
              }
              if (s <= eps2) {
                if (aId < bId) { aOut = aId; bOut = bId } else { aOut = bId; bOut = aId }
                d2Out = s
                ready = true
              }
            }
            j += 1
          }
        }
      }
      override def hasNext: Boolean = { advance(); ready }
      override def next(): (Long, Long, Long) = {
        advance()
        if (!ready) Iterator.empty.next()
        ready = false
        (aOut, bOut, d2Out)
      }
    }

  /** 64-bit FNV-1a of one token (the single-word case of [[fnvShingle]]). */
  private def fnvToken(t: String): Long = {
    var h = 0xcbf29ce484222325L
    var c = 0
    while (c < t.length) { h ^= t.charAt(c).toLong; h *= 0x100000001b3L; c += 1 }
    h
  }

  /** All pairs (a_id < b_id) with exact Jaccard ≥ threshold over per-row
    * token sets, plus the intersection size. Elements are FNV-64-hashed
    * to sorted long arrays INSIDE each task (set identity preserved up to
    * 64-bit collisions, ~N²/2⁶⁵ — the oracle gate would catch one), so
    * intersections run as primitive sorted-array merges and nothing is
    * dictionary-encoded driver-side.
    */
  def jaccardPairs(sets: Dataset[(Long, Seq[String])], threshold: Double): DataFrame = {
    val spark = sets.sparkSession
    import spark.implicits._
    val encoded = sets.mapPartitions(_.map { case (id, ss) =>
      val hs = ss.iterator.map(fnvToken).toArray.distinct
      java.util.Arrays.sort(hs)
      (id, hs)
    })
    jaccardDistributed(spark, encoded.rdd, threshold)
  }

  /** [[jaccardPairs]] over pre-hashed sets: elements are 64-bit hashes
    * computed Spark-side (e.g. `xxhash64` inside `transform` —
    * codegen'd), sorted ascending. */
  def jaccardPairsHashed(sets: Dataset[(Long, Array[Long])], threshold: Double): DataFrame =
    jaccardDistributed(sets.sparkSession, sets.rdd, threshold)

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
    })
    jaccardDistributed(spark, encoded.rdd, threshold)
  }

  private def jaccardDistributed(spark: SparkSession,
                                 rdd: RDD[(Long, Array[Long])],
                                 threshold: Double): DataFrame = {
    import spark.implicits._
    val blocks = TiledSelfJoin.defaultBlocks(spark)
    spark.createDataset(TiledSelfJoin(rdd, blocks)(jaccardTile(threshold)))
      .toDF("a_id", "b_id", "common", "jac")
  }

  /** Lazy (i, j)-cursor form, mirroring [[cosineTile]]: per-task memory
    * is the two input blocks plus one pending pair regardless of output
    * density — a threshold-0 run over an all-identical corpus streams
    * its O((N/b)²) pairs instead of buffering them in one task's heap.
    */
  private[graft] def jaccardTile(threshold: Double)(
      left: Array[(Long, Array[Long])], right: Array[(Long, Array[Long])],
      diag: Boolean): Iterator[(Long, Long, Long, Double)] = {
    // The emitted filter is on round4(jac) ≥ t, so jac as low as
    // t − 5e-5 can round up into the result: derive the count bound
    // from that widened threshold. jac ≥ t' needs common ≥
    // ceil(t'(na+nb)/(1+t')); skip the merge when sizes can't reach
    // it, abort mid-merge once the remainder can't either. Duplicate
    // ids never pair with themselves: the contract is a_id < b_id.
    val tEff = math.max(threshold - 5e-5, 0.0)
    new scala.collection.AbstractIterator[(Long, Long, Long, Double)] {
      private var i = 0
      private var j = if (diag) 1 else 0
      private var ready = false
      private var aOut = 0L; private var bOut = 0L
      private var commonOut = 0L; private var jacOut = 0.0
      private def advance(): Unit = {
        while (!ready && i < left.length) {
          if (j >= right.length) {
            i += 1
            j = if (diag) i + 1 else 0
          } else {
            val (aId, av) = left(i)
            val (bId, bv) = right(j)
            val cMin = math.ceil(tEff * (av.length + bv.length) / (1 + tEff) - 1e-9).toInt
            if (aId != bId && math.min(av.length, bv.length) >= cMin) {
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
                if (jac >= threshold) {
                  if (aId < bId) { aOut = aId; bOut = bId } else { aOut = bId; bOut = aId }
                  commonOut = common.toLong
                  jacOut = jac
                  ready = true
                }
              }
            }
            j += 1
          }
        }
      }
      override def hasNext: Boolean = { advance(); ready }
      override def next(): (Long, Long, Long, Double) = {
        advance()
        if (!ready) Iterator.empty.next()
        ready = false
        (aOut, bOut, commonOut, jacOut)
      }
    }
  }
}
