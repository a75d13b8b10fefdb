package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.{Pq, VectorOps}

/** STREAMING ANN-INDEX MAINTENANCE — the vector-side sibling of
  * [[CorpusIngest]]: each micro-batch of (vec_id, embedding) rows is
  * assigned to its IVF cell and PQ-encoded against the TRAINED models
  * (quantizer centroids + codebooks are frozen ingest artifacts — the
  * q30/q74 contract; retraining per batch would silently re-key the
  * whole stored index), then appended to the stored codes table in the
  * q78 search layout: `(vec_id, cell, codes)`, where the cell column
  * prunes WHICH rows a probe touches and the m-byte codes bound the
  * BYTES per touched row. Searches read the store and never re-encode.
  *
  * Replay discipline: the source checkpoint makes delivery
  * effectively-once; the parquet append is at-least-once on
  * crash-retry, and a replayed batch anti-joins the store on vec_id so
  * rows appended before the crash are not duplicated — the same
  * converge-on-retry shape as [[CorpusIngest]]'s md5 tier. (A vec_id
  * REDELIVERED with different payload keeps the stored encoding — ids
  * are immutable content handles here, as doc ids are for signatures.)
  *
  * At 100 TB: per-batch cost is one scan of the batch (assignment is a
  * broadcast of nCells model rows; encode is a scan-local literal
  * argmin — no exchange at all beyond the append), and the stored
  * table grows by exactly the accepted rows. Partition the store by
  * `cell` at deployment and probes read only their cell's files.
  */
object VectorIngest {

  /** vec_ids already in the store; None before the first append. */
  private def storedIds(spark: org.apache.spark.sql.SparkSession,
                        codesDir: String): Option[DataFrame] =
    try {
      val df = spark.read.parquet(codesDir)
      if (df.columns.contains("vec_id")) Some(df.select(col("vec_id"))) else None
    } catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** One micro-batch: assign + encode against the frozen models, drop
    * already-stored ids, append. Returns the appended rows (for tests /
    * metrics). Exposed separately so batch backfills share the exact
    * semantics of the stream. */
  def ingestBatch(batch: DataFrame, ivf: VectorOps.IvfModel, pq: Pq.PqModel,
                  codesDir: String,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = batch.sparkSession
    val rows = VectorOps.assignTo(batch, idCol, vecCol, ivf)
      .select(col(idCol).as("vec_id"), col("cell"),
        Pq.codesColumn(col("__v"), pq).as("codes"))
    val fresh = storedIds(spark, codesDir) match {
      case Some(st) => rows.join(st, Seq("vec_id"), "left_anti")
      case None => rows
    }
    // materialize BEFORE appending to the directory the anti-join reads
    val out = fresh.localCheckpoint()
    out.write.mode(SaveMode.Append).parquet(codesDir)
    out
  }

  /** The continuous form: a streaming (vec_id, embedding) source driven
    * through [[ingestBatch]] per micro-batch. */
  def start(vecs: DataFrame, ivf: VectorOps.IvfModel, pq: Pq.PqModel,
            codesDir: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            idCol: String = "vec_id", vecCol: String = "embedding"): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, ivf, pq, codesDir, idCol, vecCol): Unit
      }
      .start()
}
