package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity join via prefix filtering (the AllPairs /
  * PPJoin family: Bayardo et al. WWW'07, Xiao et al. WWW'08) — the
  * exact counterpart to [[MinHashLsh]]'s approximate near-dup join.
  *
  * LSH trades recall for speed; when the pipeline needs EVERY pair at
  * Jaccard ≥ τ (legal dedup audits, benchmark decontamination sweeps),
  * the naive exact options are an all-pairs join (quadratic, dead at
  * corpus scale) or a shared-token join (every pair sharing ANY token —
  * the stopword "the" alone makes that quadratic). Prefix filtering
  * confines candidate generation to each set's RAREST tokens: order the
  * vocabulary by ascending document frequency, keep each set's first
  * `p = n − ⌈τ·n⌉ + 1` tokens under that order, and join on those only.
  *
  * Completeness (why no qualifying pair is missed): for J(A,B) ≥ τ with
  * |A| ≤ |B|, the overlap is ≥ τ·|B| (J ≥ τ forces |A∩B| ≥ τ·union ≥
  * τ·max). With t = ⌈τ·|B|⌉ the classic prefix lemma says the
  * (|A|−t+1)- and (|B|−t+1)-prefixes under a COMMON total order must
  * share a token; our per-set prefixes are at least that long
  * (|A|−⌈τ·|A|⌉+1 ≥ |A|−t+1, and |B|'s is exactly |B|−t+1), so every
  * qualifying pair surfaces as a candidate. The exact intersection
  * verify then makes the output precise — no false positives either.
  *
  * Scale shape: one token-keyed shuffle attaches document frequency
  * (window, no second scan), one groupBy(id) rebuilds per-set sorted
  * arrays, and the self-join runs on PREFIX tokens only — by
  * construction the rarest ~(1−τ) fraction of each set, so bucket sizes
  * track token rarity, not corpus size (the stopword flood never enters
  * the join). A cross-length filter (τ·max ≤ min) prunes candidates
  * before the array join; the verify is scan-local `array_intersect`
  * over the pair's two arrays. All-integer threshold tests
  * (tDen·inter ≥ tNum·union) keep the semantics engine-portable.
  */
object PrefixFilterJoin {

  /** All pairs of `docs` rows with Jaccard(tokens) ≥ tNum/tDen.
    *
    * @param docs   input with an id column and an array column of
    *               DISTINCT tokens (dedupe upstream; duplicates would
    *               break the set semantics)
    * @return (a_id, b_id, inter, n_a, n_b, jac) with a_id < b_id,
    *         inter/n_a/n_b exact longs, jac rounded to 4 places
    */
  def join(docs: DataFrame, idCol: String, tokCol: String,
           tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold $tNum/$tDen not in (0,1]")
    val ex = docs.select(col(idCol).as("__id"), explode(col(tokCol)).as("__tok"))
    // ascending-df vocabulary order, attached in the same shuffle that
    // counts it (window over the token key — no groupBy + re-join)
    val wdf = Window.partitionBy(col("__tok"))
    val ranked = ex.withColumn("__df", count(lit(1)).over(wdf))
    // per-set arrays sorted by (df, token): collect_list order is
    // partition-dependent, so array_sort over (df, tok) structs
    // canonicalizes before the transform strips the df. PINNED: the
    // relation is consumed three times (prefix explode + both verify
    // sides) — unpinned, each reference re-plans the tokenize + two
    // shuffles (the q157 discipline; at scale this is the sorted-set
    // relation a pipeline materializes beside the corpus once)
    val arr = graft.core.Pins.pin(ranked.groupBy(col("__id"))
      .agg(array_sort(collect_list(struct(col("__df"), col("__tok")))).as("__st"))
      .select(col("__id"),
        expr("transform(__st, x -> x.__tok)").as("__toks"),
        size(col("__st")).cast("long").as("__n")))
    // p = n − ⌈τ·n⌉ + 1, all-integer: ⌈a/b⌉ = (a + b − 1) div b
    val prefix = arr.select(col("__id"), col("__n"),
      explode(expr(
        s"slice(__toks, 1, __n - (($tNum * __n + ${tDen - 1}) div $tDen) + 1)"))
        .as("__ptok"))
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.__ptok") === col("y.__ptok") && col("x.__id") < col("y.__id") &&
          // J ≥ τ forces min/max ≥ τ — prune length-incompatible pairs
          // before they reach the (wider) verify join
          lit(tNum) * greatest(col("x.__n"), col("y.__n")) <=
            lit(tDen) * least(col("x.__n"), col("y.__n")))
      .select(col("x.__id").as("a_id"), col("y.__id").as("b_id"))
      .distinct()
    val verified = cand
      .join(arr.select(col("__id").as("a_id"), col("__toks").as("__ta"),
        col("__n").as("n_a")), "a_id")
      .join(arr.select(col("__id").as("b_id"), col("__toks").as("__tb"),
        col("__n").as("n_b")), "b_id")
      .withColumn("inter", size(array_intersect(col("__ta"), col("__tb"))).cast("long"))
      .filter(lit(tDen) * col("inter") >= lit(tNum) * (col("n_a") + col("n_b") - col("inter")))
    verified.select(col("a_id"), col("b_id"), col("inter"), col("n_a"), col("n_b"),
      round(col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")).cast("double"), 4).as("jac"))
  }
}
