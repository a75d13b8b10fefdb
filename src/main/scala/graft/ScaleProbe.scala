package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale probe: replicates sf0.1 tables in /tmp with shifted keys
  * and times the heavy operators, to check growth is ~linear where the
  * design claims it (LSH near-dup, aggregation) — evidence for the
  * SURVEY §6 scale notes.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/graft_sf1x"
    def rep(name: String, key: String, n: Int): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val maxKey = base.agg(org.apache.spark.sql.functions.max(col(key))).head().getLong(0) + 1
      (0 until n).map(i => base.withColumn(key, col(key) + lit(i * maxKey)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    rep("documents", "doc_id", 10)
    rep("lineitem", "l_orderkey", 10)
    rep("embeddings", "vec_id", 10)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    import graft.queries.{CoreQueries, PipelineQueries}
    // warmup on the small side
    PipelineQueries.q19(spark, src).count()
    CoreQueries.q11(spark, src).count()
    time("q19_lsh_neardup sf0.1   (5k docs) ")(PipelineQueries.q19(spark, src).count())
    time("q19_lsh_neardup sf1.0  (50k docs) ")(PipelineQueries.q19(spark, out).count())
    time("q11_tpch_pricing sf0.1 (600k rows)")(CoreQueries.q11(spark, src).count())
    time("q11_tpch_pricing sf1.0   (6M rows)")(CoreQueries.q11(spark, out).count())
    time("q23_ann_lsh sf0.1      (5k vecs)  ")(PipelineQueries.q23(spark, src).count())
    time("q23_ann_lsh sf1.0     (50k vecs)  ")(PipelineQueries.q23(spark, out).count())
    // Exact all-pairs tier (TiledSelfJoin): comparisons grow N² by design —
    // the probe here is that 10× data runs AT ALL with flat driver/task
    // memory (pre-tiling these kernels collect()ed the corpus onto the
    // driver) and that tasks spread across all tiles.
    time("q21_ngram_jaccard sf0.1 (5k docs) ")(PipelineQueries.q21(spark, src).count())
    time("q21_ngram_jaccard sf1.0 (50k docs)")(PipelineQueries.q21(spark, out).count())
    time("q22_cosine_pairs sf0.1  (5k vecs) ")(PipelineQueries.q22(spark, src).count())
    time("q22_cosine_pairs sf1.0 (50k vecs) ")(PipelineQueries.q22(spark, out).count())
    spark.stop()
  }
}
