package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Inverted-index LAYOUT for corpus retrieval — the text-side analog of
  * the bucketed band table ([[MinHashLsh.bandTable]]): postings
  * `(term, doc_id, tf, dl)` are materialized ONCE at ingest and written
  * `bucketBy(n, "term").sortBy("term")`, so every subsequent keyword
  * query reads only the probed terms' buckets and joins with ZERO
  * exchange on the term key. Corpus statistics (N, avgdl, per-term df)
  * are the query-time MODEL: df lives in the index itself (a window at
  * build time would force a second sort — it is an aggregate here,
  * folded into the stored rows), N/avgdl in a one-row stats relation.
  *
  * At 100 TB this is the only viable retrieval shape: scoring from raw
  * text re-scans the corpus per query; scoring from the index touches
  * |terms| buckets regardless of corpus size.
  */
object InvertedIndex {

  /** Postings relation from a `(doc_id, text)` corpus: one row per
    * distinct (doc, term) with the term frequency, document length and
    * the term's document frequency (stored in-row so queries need no
    * second aggregation). The df comes from a WINDOW over the tf
    * relation itself — an aggregate-then-rejoin would re-execute the
    * scan+explode per join side (column pruning blocks exchange
    * unification; the q61/q62 lesson this repo's PLANS.md documents).
    * One corpus scan, one shuffle; write the result
    * `bucketBy(n, "term").sortBy("term")` to pin the layout. */
  def build(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("dl"),
        explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"))
  }

  /** The one-row `(n_docs, avgdl)` stats relation for [[bm25]] —
    * computed with the index and stored beside it (model-sized). */
  def stats(docs: DataFrame): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      (sum(size(TextOps.tokens(col("text"))).cast("long")).cast("double") /
        count(lit(1))).as("avgdl"))

  /** BM25 top-k over a STORED index: filter to the query terms (a
    * bucketed+sorted index serves this bucket-locally), score, sum per
    * doc. `statsRel` is the [[stats]] one-row relation (broadcast).
    * Scoring matches q62's formula term for term. */
  def bm25(index: DataFrame, statsRel: DataFrame, terms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val idf = log((col("n_docs").cast("double") - col("df") + 0.5) /
      (col("df") + 0.5) + 1.0)
    val score = idf * col("tf").cast("double") * (k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    index.filter(col("term").isInCollection(terms))
      .crossJoin(broadcast(statsRel))
      .groupBy(col("doc_id"))
      .agg(round(sum(score), 4).as("bm25"), count(lit(1)).as("n_terms"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }
}
