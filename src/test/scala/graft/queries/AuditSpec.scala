package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.TextOps

/** Invariant tests for the audit-query family (q114–q118) on sf0.001,
  * complementing the DuckDB oracle gate with the properties an exact
  * value compare cannot express: containment between the fuzzy and
  * exact contamination sets, recall bounds, and alarm consistency.
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("q114: ratios bounded, verdict consistent, duplicated chunks symmetric") {
    val got = AuditQueries.q114(spark, sf0001)
      .select("doc_id", "n_chunks", "n_dup_chunks", "dup_ratio", "verdict")
      .as[(Long, Long, Long, Double, String)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, nc, dup, r, v) =>
      assert(nc >= 1 && dup >= 0 && dup <= nc, s"doc $id: $dup/$nc")
      assert(r >= 0.0 && r <= 1.0, s"doc $id ratio $r")
      assert(v == (if (dup * 2 > nc) "drop" else "keep"), s"doc $id verdict $v")
    }
    // duplication is a cross-doc property: any doc with a dup chunk implies
    // at least one OTHER doc also has a dup chunk (the sharer)
    val withDups = got.count(_._3 > 0)
    assert(withDups != 1, "a lone doc cannot share a chunk with itself")
  }

  test("q115: fuzzy contamination ⊇ exact 5-gram contamination, per doc") {
    // exact contamination reference: distinct positional 5-grams shared
    // verbatim with the src0 benchmark (q59's construction at n=5)
    val docs = Tables.load(spark, sf0001, "documents")
    val sh = docs.select(col("doc_id"), col("source"),
      explode(array_distinct(TextOps.shinglesNative(col("text"), 5))).as("g"))
    val bench = sh.filter(col("source") === "src0").select(col("g")).distinct()
    val exact = sh.filter(col("source") =!= "src0")
      .join(bench, "g").groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    val fuzzy = AuditQueries.q115(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (id, n) =>
      assert(fuzzy.getOrElse(id, 0L) >= n,
        s"doc $id: fuzzy ${fuzzy.get(id)} < exact $n — tolerance lost exact matches")
    }
  }

  test("q116: drift bounded in [0, 2] and label counts cover the table") {
    val got = AuditQueries.q116(spark, sf0001)
      .as[(Int, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (l, n, drift) =>
      assert(n > 0, s"label $l empty")
      assert(drift >= 0.0 && drift <= 2.0, s"label $l drift $drift")
    }
    val total = Tables.load(spark, sf0001, "embeddings").count()
    assert(got.map(_._2).sum == total, "per-label n_vecs must partition the table")
  }

  test("q117: recall bounds — n_hits ≤ 10 and ≤ candidate-set size") {
    val got = AuditQueries.q117(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (p, nc, nh, r) =>
      assert(nc >= 1, s"probe $p: empty bucket (its own bucket always matches)")
      assert(nh >= 0 && nh <= 10 && nh <= nc, s"probe $p: hits $nh cand $nc")
      assert(math.abs(r - nh / 10.0) < 1e-9, s"probe $p recall $r != $nh/10")
    }
  }

  test("q117: widening the probe set to every vector keeps recall defined") {
    // the 4-bit bucket of each probe always contains the probe's own
    // neighbors-in-bucket; candidate counts across probes must sum to
    // Σ (bucket size − 1) over probed buckets — cross-checked for the
    // declared 5-probe set against an independent bucket histogram
    val e = Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("bkt", graft.functions.VectorOps.signBucket(col("v"), 4))
    val sizes = e.groupBy("bkt").count().as[(Long, Long)].collect().toMap
    val probeBkt = e.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("bkt")).as[(Long, Long)].collect().toMap
    val got = AuditQueries.q117(spark, sf0001)
      .select("probe_id", "n_candidates").as[(Long, Long)].collect().toMap
    probeBkt.foreach { case (p, b) =>
      assert(got(p) == sizes(b) - 1,
        s"probe $p: candidates ${got(p)} != bucket size ${sizes(b)} - 1")
    }
  }

  test("q118: spike ⟺ z ≥ 2, seasonal groups well-formed") {
    val got = AuditQueries.q118(spark, sf0001)
      .select("h", "hod", "n", "seasonal_mean", "z", "spike")
      .as[(java.sql.Timestamp, Int, Long, Double, Double, Int)].collect()
    assert(got.nonEmpty)
    got.foreach { case (h, hod, n, mean, z, spike) =>
      assert(hod >= 0 && hod <= 23)
      assert(spike == (if (z >= 2.0) 1 else 0), s"$h: spike $spike z $z")
      assert(mean > 0.0)
    }
    // every flagged hour must sit above its seasonal mean (one-sided alarm)
    got.filter(_._6 == 1).foreach { case (h, _, n, mean, _, _) =>
      assert(n > mean, s"$h flagged but n $n ≤ mean $mean")
    }
  }
}
