package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
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
    extends Aggregator[String, scala.collection.mutable.HashMap[String, Long],
      Seq[(String, Long)]] {
  require(capacity > 0)
  private type Buf = scala.collection.mutable.HashMap[String, Long]

  override def zero: Buf = scala.collection.mutable.HashMap.empty

  // the buffer mutates in place: reduce runs once per INPUT ROW, and an
  // immutable-Map rebuild there (especially the decrement branch, hit by
  // every tail token once the buffer fills) allocated a capacity-sized
  // map per row on the hot path
  override def reduce(buf: Buf, item: String): Buf = {
    // tolerate nullable input columns: a null item would enter the map
    // and NPE later in finish's Ordering[String] sort
    if (item == null) return buf
    buf.get(item) match {
      case Some(n) => buf(item) = n + 1
      case None if buf.size < capacity => buf(item) = 1L
      case None =>
        val dead = List.newBuilder[String]
        buf.foreachEntry { (k, v) =>
          if (v <= 1L) dead += k else buf(k) = v - 1
        }
        dead.result().foreach(buf.remove)
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreachEntry { (k, v) => a(k) = a.getOrElse(k, 0L) + v }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count; ties at the cut drop
      // together (value-based, so the result is order-independent)
      val cut = a.values.toSeq.sorted(Ordering.Long.reverse).apply(capacity)
      val dead = List.newBuilder[String]
      a.foreachEntry { (k, v) =>
        if (v - cut <= 0L) dead += k else a(k) = v - cut
      }
      dead.result().foreach(a.remove)
    }
    a
  }

  override def finish(buf: Buf): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (t, n) => (-n, t) }

  override def bufferEncoder: Encoder[Buf] =
    Encoders.kryo[Buf] // crosses the wire only at partial-agg boundaries
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

  /** Merge two finished sketches with the same mergeable-summaries rule
    * the Aggregator uses internally — for DRIVER-side accumulation of
    * model-sized sketches (e.g. the streaming monitor folding each
    * micro-batch's sketch into a stored one). The error bound is
    * additive across merges: undercount ≤ Σᵢ Nᵢ/(capacity+1) over the
    * merged streams. */
  def mergeSketches(a: Seq[(String, Long)], b: Seq[(String, Long)],
                    capacity: Int): Seq[(String, Long)] = {
    val agg = new FreqItemsAgg(capacity)
    def toBuf(s: Seq[(String, Long)]) =
      scala.collection.mutable.HashMap.from(s)
    agg.finish(agg.merge(toBuf(a), toBuf(b)))
  }
}
