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
    * all point columns + all interval columns.
    *
    * `maxBinsPerInterval` bounds the replication of ONE interval: a
    * corrupt or open-ended sentinel end value (Long.MaxValue) would
    * otherwise hand `sequence()` billions of elements and abort the
    * whole job with an opaque "too long sequence" — the guard raises a
    * named error carrying the offending bounds instead (one bad row is
    * a data bug to surface, not a job-structure failure to decipher).
    * Genuinely huge spans belong on a wider binWidth. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      binWidth: Long, maxBinsPerInterval: Long = 1000000L): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("__pbin", floor(col(pointCol) / binWidth))
    val lastBin = floor(col(endCol) / binWidth)
    val firstBin = floor(col(startCol) / binWidth)
    // span compared in DOUBLE: a Long subtraction overflows for
    // sentinel bounds like [Long.MinValue, Long.MaxValue] — exactly the
    // corrupt rows this guard exists to catch — and a negative overflow
    // would slip past the threshold into the opaque sequence error
    val span = lastBin.cast("double") - firstBin.cast("double")
    val guardedEnd = when(span < maxBinsPerInterval.toDouble, lastBin)
      .otherwise(raise_error(concat(
        lit(s"pointInInterval: interval spans >= $maxBinsPerInterval bins " +
          s"at binWidth=$binWidth ["), col(startCol).cast("string"),
        lit(", "), col(endCol).cast("string"),
        lit("] — corrupt bound or binWidth too narrow"))))
    val i = intervals.withColumn("__ibin",
      explode(sequence(firstBin, guardedEnd)))
    p.join(i, col("__pbin") === col("__ibin") &&
        col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__pbin", "__ibin")
  }
}
