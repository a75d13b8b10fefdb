package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Round-5 regression: the driver regenerated the parquet fixtures and
  * Spark 4's `inferTimestampNTZ` default surfaced their un-annotated
  * `timestamp[us]` columns as TIMESTAMP_NTZ, so every `unix_micros(ts)`
  * call site failed analysis — six queries silently vanished from the
  * round artifact. The fix is at the read boundary (SURVEY §1.3 "all
  * timestamps normalized to UTC"): [[Sessions]] disables NTZ inference
  * and [[Tables.normalizeNtz]] casts any NTZ column that still gets
  * through (e.g. Spark-written NTZ footers, which bypass inference).
  *
  * This suite rebuilds the failure: it writes an `events` fixture whose
  * `ts` is genuinely TIMESTAMP_NTZ (Spark records the NTZ type in the
  * parquet footer, so it reads back as NTZ in ANY session regardless of
  * the inference conf) and proves the loader yields TIMESTAMP and the
  * two flagship timestamp queries (q06 latest-per-group, q18 tumbling
  * windows) produce byte-identical results to the normal fixture.
  */
class NtzRegressionSpec extends SparkSpec {
  private lazy val ntzDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz").toString
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType == TimestampType)
    ev.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // sanity: the rebuilt fixture really is NTZ on a raw read — otherwise
    // this suite would pass vacuously against an LTZ file
    assert(spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
    dir
  }

  test("Tables.load normalizes TIMESTAMP_NTZ columns to TIMESTAMP") {
    assert(Tables.events(spark, ntzDir).schema("ts").dataType == TimestampType)
  }

  test("q06 latest-per-group analyzes and matches on an NTZ fixture") {
    val got = graft.queries.CoreQueries.q06(spark, ntzDir).collect()
    val want = graft.queries.CoreQueries.q06(spark, sf0001).collect()
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("q18 tumbling windows analyzes and matches on an NTZ fixture") {
    val got = graft.queries.CoreQueries.q18(spark, ntzDir).collect()
    val want = graft.queries.CoreQueries.q18(spark, sf0001).collect()
    assert(got.nonEmpty && got.sameElements(want))
  }
}
