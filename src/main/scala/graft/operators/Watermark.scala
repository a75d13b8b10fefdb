package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental watermark semantics (operators O6–O7 of SURVEY §2.1).
  *
  * The reference keeps a per-feed `lastDownloaded` sequence number and
  * (a) only processes manifest rows with `seqnum > watermark`
  * (`/root/reference/download/routeviews.go:107-110`), and (b) advances
  * the watermark after each successful file **only while no earlier file
  * in the batch has failed** (`routeviews.go:56-62`) — so the new
  * watermark is the max seqnum of the *prefix of successes*, guaranteeing
  * failed files are retried on the next run with no gaps.
  *
  * Both pieces are pure relational ops: the filter pushes down to the
  * scan (free partition pruning when seqnum correlates with partitions),
  * and the gated advance is a two-aggregate expression with map-side
  * partial aggregation — no sort, no window, scales to any row count.
  */
object Watermark {
  /** Keep only rows strictly newer than the watermark. */
  def filterNew(df: DataFrame, seqCol: Column, watermark: Long): DataFrame =
    df.filter(seqCol > lit(watermark))

  /** Gated watermark advance per group.
    *
    * new_wm = max(seqnum) if nothing failed, else min(failed seqnum) − 1:
    * exactly "max of the prefix of successes" when seqnums are processed
    * in order, as the reference does.
    */
  def gatedAdvance(df: DataFrame, groupCols: Seq[Column], seqCol: Column,
                   failedCol: Column): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(
        max(seqCol).as("max_seq"),
        min(when(failedCol, seqCol)).as("first_failed"))
      .withColumn("watermark",
        least(col("max_seq"),
          coalesce(col("first_failed") - 1, col("max_seq"))))
}
