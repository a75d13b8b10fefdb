package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval RANGE join via overlap-bin equi-join — another
  * operator Spark lacks natively: `p.t BETWEEN i.s AND i.e` with no
  * equality key plans as BroadcastNestedLoopJoin (every point against
  * every interval, quadratic work regardless of selectivity).
  *
  * Binning restores an equi-join: the value domain splits into
  * fixed-width bins, each interval replicates to every bin it overlaps
  * (`ceil(len/binWidth)+1` rows), each point belongs to exactly ONE
  * bin, and the join runs on the bin key with the exact range predicate
  * as a residual filter. Because a point probes only its own bin, every
  * qualifying (point, interval) pair is produced exactly once — no
  * dedup step. Cost: one shuffle of points + replicated intervals on
  * the bin key; comparisons confined to co-binned rows.
  *
  * Choosing binWidth: ~ the typical interval length. Wider bins mean
  * fewer replicas but more non-matching co-binned pairs for the
  * residual filter; narrower bins the reverse. Skewed bins (a hot time
  * window) are ordinary join skew — AQE skew handling or q49-style
  * salting applies unchanged.
  */
object RangeJoin {

  /** Inner-joins `points` to every interval containing them
    * (inclusive). `pointCol`/`startCol`/`endCol` must be integral
    * (epoch micros, sizes, …); intervals must satisfy s ≤ e. Output:
    * all point columns + all interval columns. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("__pbin", floor(col(pointCol) / binWidth))
    val i = intervals.withColumn("__ibin", explode(sequence(
      floor(col(startCol) / binWidth), floor(col(endCol) / binWidth))))
    p.join(i, col("__pbin") === col("__ibin") &&
        col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__pbin", "__ibin")
  }
}
