package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MerkleMaintenanceSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_merkle").toString

  private val sf = "/root/testdata/sf0.001"

  private def docs = graft.core.Tables.load(spark, sf, "documents")
    .select("doc_id", "text", "source", "n_chars")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("incremental fingerprint equals batch q267 for any batching") {
    val batchRef = rows(graft.queries.PipelineQueries.q267(spark, sf))

    // three uneven batches, arrival order shuffled within each
    val fp3 = tmp() + "/fp3"
    CorpusIngest.merkleBatch(docs.filter(col("doc_id") % 7 === 0), fp3, 0L)
    CorpusIngest.merkleBatch(docs.filter(col("doc_id") % 7 === 1), fp3, 1L)
    CorpusIngest.merkleBatch(
      docs.filter(col("doc_id") % 7 >= 2).orderBy(col("text")), fp3, 2L)
    val inc3 = rows(CorpusIngest.merkleFingerprint(spark.read.parquet(fp3)))
    assert(inc3 == batchRef)

    // one batch — same roots
    val fp1 = tmp() + "/fp1"
    CorpusIngest.merkleBatch(docs, fp1, 0L)
    val inc1 = rows(CorpusIngest.merkleFingerprint(spark.read.parquet(fp1)))
    assert(inc1 == batchRef)
  }

  test("replayed batch id refuses the merge; store is unchanged") {
    val fp = tmp() + "/fp"
    CorpusIngest.merkleBatch(docs.filter(col("doc_id") < 100), fp, 0L)
    val before = rows(CorpusIngest.merkleFingerprint(spark.read.parquet(fp)))
    // crash-replay of batch 0: concat is not idempotent, the guard is
    CorpusIngest.merkleBatch(docs.filter(col("doc_id") < 100), fp, 0L)
    assert(rows(CorpusIngest.merkleFingerprint(spark.read.parquet(fp))) == before)
    // a LATER batch still merges
    CorpusIngest.merkleBatch(
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 200), fp, 1L)
    assert(rows(CorpusIngest.merkleFingerprint(spark.read.parquet(fp))) != before)
  }

  test("untouched buckets keep their level-1 digest; touched ones re-digest") {
    val fp = tmp() + "/fp"
    CorpusIngest.merkleBatch(docs.filter(col("doc_id") < 1024), fp, 0L)
    val d1a = spark.read.parquet(fp)
      .select(col("source"), col("bucket"), md5(concat_ws("", col("hs"))).as("d1"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    // second batch lands entirely in bucket 1 (doc_id 1024..2047 —
    // synthesized; the sf0.001 fixture itself has < 1024 docs)
    CorpusIngest.merkleBatch(
      docs.filter(col("doc_id") < 100)
        .withColumn("doc_id", col("doc_id") + lit(1024L)), fp, 1L)
    val d1b = spark.read.parquet(fp)
      .select(col("source"), col("bucket"), md5(concat_ws("", col("hs"))).as("d1"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    // bucket-0 rows byte-identical, bucket-1 rows new
    d1a.foreach { case (k, v) => assert(d1b(k) == v, s"bucket $k changed") }
    assert(d1b.keys.exists(_._2 == 1L))
  }

  test("streaming form: startMerkleMaintenance over a file stream equals batch") {
    val src = tmp() + "/src"
    val fp = tmp() + "/fp"
    val ckpt = tmp() + "/ckpt"
    docs.write.parquet(src)
    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    val q = CorpusIngest.startMerkleMaintenance(stream, fp, ckpt)
    q.awaitTermination(120000)
    val got = rows(CorpusIngest.merkleFingerprint(spark.read.parquet(fp)))
    assert(got == rows(graft.queries.PipelineQueries.q267(spark, sf)))
  }
}
