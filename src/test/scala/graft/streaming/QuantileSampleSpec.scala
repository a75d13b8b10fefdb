package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q247's continuous twin: the bottom-k quantile-sample store. The twin
  * contract is the mergeable-summaries property — incremental
  * maintenance over ANY batching is bit-equal to the batch sketch over
  * the full corpus — plus replay idempotence without a batch-id guard
  * (bottom-k min-union dedups a replayed batch's members by itself,
  * the KMV-store discipline).
  */
class QuantileSampleSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_qsample").toString

  private def events = graft.core.Tables.load(spark, sf0001, "events")
    .select("event_type", "event_id", "value")

  private def quantiles(df: org.apache.spark.sql.DataFrame) = df
    .select("event_type", "p50_cents", "p95_cents")
    .as[(String, Long, Long)].collect().sortBy(_._1).toSeq

  private def storeSample(dir: String) = spark.read.parquet(dir)
    .select(col("event_type"), expr("transform(smp, x -> x.h)").as("hs"))
    .as[(String, Seq[String])].collect().sortBy(_._1).toSeq

  test("3-way-batched maintenance equals the one-shot sketch and q247's quantiles") {
    val skA = tmp() + "/sk"
    val last = Seq(0L, 1L, 2L).map { r =>
      EventStream.quantileSampleBatch(
        events.filter(pmod(col("event_id"), lit(3)) === r), skA)
    }.last
    // one-shot store over the full corpus
    val skB = tmp() + "/sk"
    EventStream.quantileSampleBatch(events, skB)
    assert(storeSample(skA) == storeSample(skB),
      "batched store must be bit-equal to the one-shot sketch")
    // emitted quantiles equal the batch query's (q247 columns p50/p95;
    // the exact count n deliberately stays batch-side)
    val batch = graft.queries.PipelineQueries.q247(spark, sf0001)
      .select("event_type", "p50_cents", "p95_cents")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(quantiles(last) == batch)
  }

  test("a crash-replayed batch is a no-op: min-union needs no batch-id guard") {
    val sk = tmp() + "/sk"
    val b1 = events.filter(pmod(col("event_id"), lit(2)) === 0L)
    val b2 = events.filter(pmod(col("event_id"), lit(2)) === 1L)
    EventStream.quantileSampleBatch(b1, sk)
    val after = quantiles(EventStream.quantileSampleBatch(b2, sk))
    val store = storeSample(sk)
    // replay b2 (the crash-before-checkpoint-commit case)
    val replayed = quantiles(EventStream.quantileSampleBatch(b2, sk))
    assert(storeSample(sk) == store, "replay must not change the store")
    assert(replayed == after, "replay must re-emit identical quantiles")
  }
}
