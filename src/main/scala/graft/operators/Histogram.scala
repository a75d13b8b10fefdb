package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact per-group value HISTOGRAM as a typed [[Aggregator]]: the
  * buffer is a (value → count) map whose size is bounded by the
  * group's DISTINCT value count — for grid-quantized measures (the
  * cents grids of q141/q295/q296) that is the value domain, not the
  * row count, so map-side combine collapses each partition's rows to
  * domain-sized partials and the shuffle carries O(groups × domain).
  *
  * This is the single-exchange alternative to the two-level
  * groupBy(g, v) → window → re-fold pipeline for order statistics: a
  * query needing BOTH a per-group distribution and another per-group
  * aggregate (q296 pairs the exact grid with the bottom-k sample) can
  * compute both in ONE keyed exchange and post-process the map with
  * codegen'd higher-order functions (sorted `map_keys` + `aggregate`
  * cumulative walk), instead of paying a second shuffle and a
  * whole-group window sort. Order statistics derived from the sorted
  * key walk are EXACT — the map is the full distribution, nothing is
  * sampled or sketched.
  */
class LongHistogramAgg
    extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {
  override def zero: Map[Long, Long] = Map.empty
  override def reduce(buf: Map[Long, Long], in: Long): Map[Long, Long] =
    buf.updated(in, buf.getOrElse(in, 0L) + 1L)
  // fold the SMALLER map into the larger: merge cost tracks the
  // smaller side, and partial-combine makes both domain-sized
  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foldLeft(big) { case (m, (k, v)) =>
      m.updated(k, m.getOrElse(k, 0L) + v)
    }
  }
  override def finish(buf: Map[Long, Long]): Map[Long, Long] = buf
  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object Histogram {
  /** Column aggregate: exact (value → count) map per group. Usage:
    * `df.groupBy(g).agg(Histogram.longHistogram(v))`. */
  def longHistogram: Column => Column = {
    val fn = udaf(new LongHistogramAgg)
    v => fn(v)
  }
}
