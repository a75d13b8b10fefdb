package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy hitters as a typed [[Aggregator]]: a mergeable
  * frequent-items SKETCH bounded at `capacity` counters regardless of
  * stream length or cardinality — the q47/q71 policy applied to top-k
  * term frequency (an exact global count of a 100 TB token stream is one
  * groupBy over billions of distinct keys; the sketch shuffles ≤ capacity
  * rows per partition).
  *
  * reduce: count if tracked; open a counter if room; else decrement all
  * (dropping zeros) — the classic MG step. merge: pointwise sum, then
  * subtract the (capacity+1)-th largest count so at most `capacity`
  * survive (Agarwal et al.'s mergeable-summaries rule, preserving the
  * error bound). Guarantees, for stream length N:
  *  - undercount only: est ≤ true, and true − est ≤ N/(capacity+1);
  *  - every item with true > N/(capacity+1) is present in the sketch.
  * Estimates are deterministic for a fixed plan but depend on the merge
  * tree, so cross-engine value oracles don't apply (rows-only check).
  */
class FreqItemsAgg(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(capacity > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(n) => buf.updated(item, n + 1)
      case None if buf.size < capacity => buf.updated(item, 1L)
      case None =>
        buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (k, v)) =>
      m.updated(k, m.getOrElse(k, 0L) + v)
    }
    if (summed.size <= capacity) summed
    else {
      // subtract the (capacity+1)-th largest count; ties at the cut drop
      // together (value-based, so the result is order-independent)
      val cut = summed.values.toSeq.sorted(Ordering.Long.reverse).apply(capacity)
      summed.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (t, n) => (-n, t) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object FrequentItems {
  /** Column aggregate: the MG sketch of a string column as
    * (item, est_count) pairs ordered est DESC, item ASC.
    * Usage: `df.groupBy(g).agg(FrequentItems.sketch(64)(col("term")))`. */
  def sketch(capacity: Int): Column => Column = {
    val fn = udaf(new FreqItemsAgg(capacity))
    term => fn(term)
  }
}
