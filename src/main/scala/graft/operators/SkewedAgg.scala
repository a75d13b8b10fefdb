package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation and join helpers.
  *
  * At 100 TB a handful of hot keys (one user, one dedup scope, one
  * language) can swamp single reducers. Two standard remedies, both pure
  * dataflow:
  *
  *  - [[twoPhaseAgg]] salts the grouping key with a random shard, does a
  *    partial aggregate per (key, shard), then combines shards — the hot
  *    key's work spreads over `shards` reducers. (Catalyst's partial
  *    aggregation already does this for algebraic aggregates when input
  *    partitions are balanced; explicit salting covers the case where a
  *    single *post-shuffle* key explodes, e.g. high-cardinality
  *    distinct-like states.)
  *  - [[saltedJoin]] replicates the build side `shards` times and salts
  *    the probe side so one hot join key fans out over `shards` tasks
  *    (AQE's skew-join handles sort-merge splits; this covers hash joins
  *    and deterministic plans).
  */
object SkewedAgg {

  /** Two-phase (salted) sum/count aggregation: returns
    * `keyCols ++ [sum_<valueAlias>, cnt_<valueAlias>]`. */
  def twoPhaseAgg(df: DataFrame, keyCols: Seq[Column], value: Column,
                  valueAlias: String, shards: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id(), lit(shards)))
    val partial = salted
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(value).as("__ps"), count(value).as("__pc"))
    partial
      .groupBy(keyCols: _*)
      .agg(sum(col("__ps")).as(s"sum_$valueAlias"),
           sum(col("__pc")).as(s"cnt_$valueAlias"))
  }

  /** Salted equi-join: `left` (large, possibly skewed) joined to `right`
    * (small-ish build side) on `key`. The build side is replicated once
    * per shard; the probe side picks a deterministic shard per row.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 shards: Int = 8): DataFrame = {
    val probe = left.withColumn("__salt", pmod(spark_partition_id(), lit(shards)))
    val build = right.crossJoin(broadcast(
      left.sparkSession.range(shards).select(col("id").cast("int").as("__salt"))))
    probe.join(build, Seq(key, "__salt")).drop("__salt")
  }
}
