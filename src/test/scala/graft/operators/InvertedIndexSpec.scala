package graft.operators

import graft.SparkSpec
import graft.core.Tables
import graft.queries.PipelineQueries

/** Inverted-index retrieval layout: index-served BM25 must equal the
  * from-text q62 scoring, and a bucketed index must serve a keyword
  * probe bucket-locally (bucket pruning visible in the scan).
  */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sf0001, "documents")
  private val terms = Seq("table", "hash", "stream")

  test("index-served BM25 equals the from-text q62 scoring") {
    val idx = InvertedIndex.build(docs.select("doc_id", "text"))
    val st = InvertedIndex.stats(docs)
    val got = InvertedIndex.bm25(idx, st, terms, 20)
      .as[(Long, Double, Long)].collect().toSeq
    val expect = PipelineQueries.q62(spark, sf0001)
      .as[(Long, Double, Long)].collect().toSeq
    assert(got == expect)
  }

  test("build scans the corpus once (df from a window, not a rejoin)") {
    val df = InvertedIndex.build(docs.select("doc_id", "text"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected 1 corpus scan, got $scans:\n$plan")
  }

  test("bucketed index serves the probe from the probed terms' buckets only") {
    InvertedIndex.build(docs.select("doc_id", "text"))
      .write.bucketBy(8, "term").sortBy("term")
      .mode("overwrite").saveAsTable("probe_inv_index")
    val q = InvertedIndex.bm25(spark.table("probe_inv_index"),
      InvertedIndex.stats(docs), terms, 20)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // bucket pruning: the term IN (...) filter selects a strict subset
    // of the 8 buckets at scan time — the stored layout, not a shuffle,
    // confines the probe
    val sel = """SelectedBucketsCount: (\d+) out of (\d+)""".r
      .findFirstMatchIn(plan)
    assert(sel.isDefined, s"no bucket pruning in plan:\n$plan")
    assert(sel.get.group(1).toInt < sel.get.group(2).toInt,
      s"probe read every bucket: ${sel.get.matched}")
  }
}
