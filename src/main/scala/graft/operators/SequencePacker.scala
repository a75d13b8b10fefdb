package graft.operators

import org.apache.spark.sql.{Dataset, Encoders}

/** One packable item: a document's token count inside its packing
  * shard. `tokens` must already be clamped to the bin capacity by the
  * caller (an over-long doc is truncated — the declared semantics). */
case class PackDoc(lang: String, source: String, doc_id: Long, tokens: Long)

/** Per-shard packing outcome. */
case class PackShard(lang: String, source: String, n_docs: Long,
                     n_bins: Long, total_tokens: Long, lower_bound: Long,
                     util_ppm: Long, gap_bins: Long)

/** SEQUENCE PACKING — the "sample packing" step of LLM pre-training
  * batch prep: fill fixed-size context windows (bins of `capacity`
  * tokens) with whole documents so padding is minimized, instead of
  * one-doc-per-row padding waste. Strategy: NEXT-FIT DECREASING per
  * shard — docs sorted (tokens DESC, doc_id ASC), each doc goes into
  * the current bin if it fits, else opens a new bin. Next-fit keeps
  * O(1) state (one remaining-capacity counter), making the fold a
  * single ordered pass; first-fit/best-fit keep every open bin live
  * and buy little on decreasing input (NFD ≤ 2·OPT worst-case, and
  * the emitted `lower_bound`/`gap_bins` columns measure the actual
  * gap per shard, so the quality claim is audited in the output
  * itself, not assumed).
  *
  * Like [[KeyedLedger]], this is the genuinely SEQUENTIAL per-key
  * fold a window cannot express: whether a doc opens a new bin
  * depends on the POST-DECISION remaining capacity from the previous
  * doc, so no prefix-sum reformulation exists. The scale-correct
  * batch form is typed `flatMapGroups`: one shuffle on the shard key,
  * an in-memory ordered fold per shard, O(1) state. The SHARD is the
  * scale dial (the q250 rationale): packing is only ever defined
  * within a shard, a shard's docs must fit a task, and production
  * sub-shards a hot (lang, source) by hash without changing the
  * contract. Determinism: (tokens DESC, doc_id ASC) is a total
  * order, all arithmetic exact Long — bit-identical on any
  * partitioning (spec-pinned under 1/3/32 partitions).
  */
object SequencePacker {
  def nextFitDecreasing(ds: Dataset[PackDoc], capacity: Long)
      : Dataset[PackShard] = {
    require(capacity > 0, "bin capacity must be positive")
    implicit val enc = Encoders.product[PackShard]
    ds.groupByKey(d => (d.lang, d.source))(
        Encoders.tuple(Encoders.STRING, Encoders.STRING))
      .flatMapGroups { (key: (String, String), it: Iterator[PackDoc]) =>
        val (lang, source) = key
        // clamp BEFORE the sort so the declared (tokens DESC, doc_id
        // ASC) total order is over the same clamped values the oracle
        // orders by — a caller that violates the pre-clamp contract
        // still gets oracle-identical bin counts
        val rows = it.toArray
          .map(d => if (d.tokens > capacity) d.copy(tokens = capacity) else d)
          .sortBy(d => (-d.tokens, d.doc_id))
        var bins = 0L; var rem = 0L; var total = 0L
        var i = 0
        while (i < rows.length) {
          val tk = rows(i).tokens
          total += tk
          if (bins == 0L || tk > rem) { bins += 1; rem = capacity - tk }
          else rem -= tk
          i += 1
        }
        val lb = (total + capacity - 1) / capacity
        val util = if (bins == 0L) 0L else total * 1000000L / (bins * capacity)
        Iterator.single(PackShard(lang, source, rows.length.toLong, bins,
          total, lb, util, bins - lb))
      }
  }
}
