package graft.queries

import graft.SparkSpec

/** Repo-wide plan-audit RATCHET: the number of parquet scans each
  * declared query plans must never exceed the audited baseline. The
  * q61/q62/q64 rewrites each removed a redundant corpus re-scan caused
  * by unmaterialized-relation re-execution (column pruning blocks
  * exchange unification, so a relation consumed twice plans its scan
  * twice) — this spec pins every query's scan count so the pattern
  * cannot silently creep back in. Counts come from the analyzed
  * physical plan (no execution); multi-table joins legitimately scan
  * once per table, and the documented model-derivation rescans (q63's
  * LM, q64's assignment, q67's counts, q70's rollup) are part of the
  * audited baseline, not violations.
  */
class PlanAuditSpec extends SparkSpec {

  test("no query plans more parquet scans than its audited baseline") {
    val baseline = PlanAuditSpec.ScanBaseline
    val over = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
        val scans = plan.linesIterator.count(_.contains("Scan parquet"))
        val allowed = baseline.getOrElse(name, PlanAuditSpec.DefaultMax)
        if (scans > allowed) Some(s"$name: $scans scans (baseline $allowed)")
        else None
    }
    assert(over.isEmpty, s"scan-count regressions:\n${over.mkString("\n")}")
  }

  test("partition-less Window operators appear only on whitelisted grid/model-sized inputs") {
    // the round-10 verdict's open ratchet: `WindowExec: No Partition
    // Defined` warnings were spot-checked to grid/model-sized inputs
    // (hour grids, score grids — by design), but nothing PINNED that:
    // a future corpus-sized global window would sail through the scan
    // and Exchange caps above. This whitelists today's audited global
    // windows BY QUERY; a new one (or one added to an existing query)
    // is a red test that forces the small-input justification to be
    // re-argued, not assumed.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def globalWindows(p: SparkPlan): Int = {
      val here = p.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => 1
        case a: AdaptiveSparkPlanExec => globalWindows(a.inputPlan)
      }.sum
      here
    }
    val allowed = PlanAuditSpec.GlobalWindowWhitelist
    val over = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = globalWindows(fn(spark, sf0001).queryExecution.executedPlan)
        val cap = allowed.getOrElse(name, 0)
        if (n > cap) Some(s"$name: $n global Window(s), whitelisted $cap")
        else None
    }
    assert(over.isEmpty,
      s"unwhitelisted partition-less Windows:\n${over.mkString("\n")}")
  }

  test("no query plans more shuffle Exchanges than its audited baseline") {
    // BroadcastExchange is excluded deliberately: broadcasts ship
    // model-sized relations and are the REMEDY the scale designs reach
    // for, not the hazard this ratchet guards (an added broadcast is
    // visible in the scan/plan reviews; an added shuffle is the thing
    // that silently becomes the 100 TB bottleneck).
    val baseline = PlanAuditSpec.ShuffleBaseline
    val over = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
        val shuffles = plan.linesIterator.count(l =>
          l.contains("Exchange ") && !l.contains("BroadcastExchange"))
        val allowed = baseline.getOrElse(name, PlanAuditSpec.DefaultMaxShuffles)
        if (shuffles > allowed) Some(s"$name: $shuffles shuffles (baseline $allowed)")
        else None
    }
    assert(over.isEmpty, s"shuffle-count regressions:\n${over.mkString("\n")}")
  }
}

object PlanAuditSpec {
  /** Audited partition-less (global) Window occurrences per query.
    * Queries not listed admit ZERO global windows; a new one is a red
    * test that forces this audit to be re-argued, not assumed.
    *
    * r15 re-audit (round-14 verdict item 8): every entry below was
    * re-verified against its window's actual INPUT relation in source,
    * and annotated with the size argument. Three honest tiers:
    *
    * - GRID: the input is a value/time/digit DOMAIN (hour/day grid,
    *   quantized-score grid, cents domain, Benford digits, IVF cells,
    *   langs) — bounded by the domain at any corpus size. A
    *   single-partition sort over a grid is by design.
    * - DAY-SLICE: one calendar day's rows (q86's reference-day
    *   breakpoints) — bounded by daily volume, with the documented
    *   escape hatch (swap in the q71 mergeable sketch when a day
    *   outgrows a sort).
    * - ENTITY: a per-customer/user/source fold ranked or prefix-summed
    *   globally AFTER the corpus collapses (Gini/Pareto/RFM/quota
    *   ranks). Bounded by |entities|, NOT by a domain — the honest
    *   caveat: at 10⁸+ entities these single-partition sorts become
    *   the wall, and the scalable form is a two-level prefix sum
    *   (range-partitioned rank + per-partition offsets). They stay
    *   declared-exact here because the cumulative semantics ARE the
    *   query; the rewrite is recorded as the known dial, and the
    *   ratchet pins today's count so nothing NEW joins the tier
    *   silently. */
  val GlobalWindowWhitelist: Map[String, Int] = Map(
    // GRID tier
    "q42_range_frame" -> 1,        // const filter event_id<2000 (in-code contract at the site)
    "q104_vocab_growth" -> 1,      // doc-count buckets (log-spaced grid)
    "q113_burst_detection" -> 2,   // hour grid
    "q119_vocab_coverage" -> 1,    // vocabulary folded to (k, term) counts — token-domain
    "q132_sliding_distinct" -> 1,  // hour grid (the deltas/sequence walk)
    "q141_ks_drift" -> 1,          // n_chars value domain
    "q167_equidepth_hist" -> 1,    // distinct-cents value domain
    "q172_neyman_allocation" -> 2, // |event_types| strata
    "q180_benford" -> 1,           // 9 leading digits
    "q188_rolling_median" -> 1,    // day grid
    "q189_cusum" -> 3,             // day grid; r15: fallback tier only (the
                                   // driver replay plans ZERO windows under the gate)
    "q193_km_survival" -> 2,       // distinct-duration grid
    "q199_quantile_norm" -> 1,     // distinct-cents pool
    "q207_roc_auc" -> 3,           // quantized-score grid (≤ 1e6+1 cells)
    "q208_kruskal_wallis" -> 1,    // distinct-count grid
    "q234_benford_audit" -> 1,     // 9 digits
    "q261_survival_hazard" -> 2,   // day grid
    "q278_embedding_auc" -> 2,     // quantized-score grid (≤ 20001 cells)
    "q279_conformal_gate" -> 1,    // quantized-score grid
    "q280_fairness_parity" -> 1,   // groups-sized
    "q285_fertility_parity" -> 1,  // langs-sized
    "q292_ivf_balance" -> 2,       // IVF cells
    "q301_mutual_information" -> 1, // ≤ 120-cell (type, hour) grid
    // DAY-SLICE tier
    "q86_quantile_drift" -> 3,     // ONE reference day's values (documented sketch swap past that)
    // ENTITY tier (see caveat above)
    "q98_hybrid_rrf" -> 2,         // two top-k fused rank lists (k-bounded at the source)
    "q130_countmin_heavy" -> 1,    // users ranked by estimate (top-20 kept)
    "q137_rfm_segments" -> 3,      // customers × 3 percentile ranks
    "q139_quota_holdout" -> 1,     // sources (strata-sized — small in practice)
    "q152_gini" -> 1,              // customers cumulative (Lorenz walk)
    "q171_skyline" -> 1,           // customers (dominance scan)
    "q187_share_of_parent" -> 1,   // nations fold (≤ |nations| rows)
    "q213_pareto_abc" -> 2,        // customers cumulative (ABC walk)
    "q249_uncertainty_sample" -> 1, // margin ranks over scored pool
    "q258_token_waterfill" -> 6,   // sources (water-filling walk)
    "q260_source_gini" -> 3,       // sources cumulative
  )

  /** Default cap for queries not listed below. */
  val DefaultMax = 4

  /** Default shuffle-Exchange cap; audited via `graft.tools.PlanStats`
    * (most queries plan 1-3 shuffles: the keyed work + the output
    * sort). Queries above it are consciously recorded below. */
  val DefaultMaxShuffles = 4

  /** Audited shuffle counts above the default — each one has a reason:
    * q19's banded join + verify re-join legitimately re-keys; q38/q63/
    * q105 carry the documented model-derivation relineage; q68/q86/q94
    * window-then-aggregate on different keys; q89/q107 fold model
    * marginals as window sums (each distinct partition key is one
    * Exchange); q93's three power iterations re-key per round; q109's
    * audit joins the pair list to BOTH sides of the assignment (at
    * scale labels/pairs are stored columns and most of these collapse
    * to pruned scans); q121 builds FOUR independently-keyed gate
    * verdicts (term counts, content-hash window, chunk-hash counts,
    * shingle contamination) off one pinned scan and folds them on
    * doc_id — each gate's re-key is intrinsic, and at scale the gates
    * are stored verdict columns (the query is their initial build). */
  val ShuffleBaseline: Map[String, Int] = Map(
    "q121_curation_funnel" -> 10,
    // q303 (round 13): the pair fold itself is PINNED at build time
    // (it left the audited plan); the residual five are the cell-size
    // fold over the assigned vectors (the one data-sized exchange),
    // the pair-count fold, the removed-id distinct + count (both over
    // the groups-sized pinned relation), and the cells-sized output
    // sort — the stats joins broadcast, never shuffle
    "q303_semantic_dedup" -> 5,
    // q271: the one corpus exchange is the PINNED (class, value) count
    // fold; the residual plan's exchanges (post-broadcast-grid: the
    // nc/gv/tot re-folds off the pin, the per-class cumulative window,
    // the audit fold, the sort) all carry ≤ classes×values = 625 rows
    "q271_t_closeness" -> 6,
    // q279: the two corpus-sized exchanges are the calibration and
    // holdout nonconformity-GRID folds off the pinned scored scan;
    // the residual three (grid cumulative window, the 3-row coverage
    // fold, the 3-row sort) all carry grid-or-smaller relations
    "q279_conformal_gate" -> 5,
    // q276: corpus work lives in the pinned LSH pair artifact + the
    // pinned member relation; the residual exchanges (base fold,
    // canonical window, lang-mode fold + window, two component joins,
    // sort) are all CLUSTER-sized
    "q276_survivorship" -> 6,
    // q200: the corpus-shaped work (tiled ε-join, CC) is pinned or
    // local; r14 dropped the qv/sym checkpoint pins (each pin job cost
    // more than recomputing the scan-local projection — measured
    // 4.6 → 2.4 s), so the sym union's edges-sized exchanges now show
    // INLINE in this single plan instead of hiding behind checkpoint
    // boundaries: total shuffle WORK is unchanged (the pinned form paid
    // the same exchanges inside the pin jobs), the visible count is 10
    // — two core semi-joins, border min-fold, two role left-joins, the
    // sym-side join exchanges, the final sort; all graph-sized
    "q200_dbscan" -> 10,
    // q125's corpus-shaped work happens in the PINNED pair build (the
    // q19 shape, audited there at 8); the residual plan's five
    // exchanges all carry degrees-sized relations (histogram groupBy,
    // the degree-0 anti-join, final sort)
    "q125_neardup_degree" -> 5,
    // q127 runs BOTH dedup machines once each — the tiled exact join
    // (its tile shuffle) and the full q19 LSH pipeline (audited there
    // at 8) — then folds two counts; the union-agg itself adds one
    "q127_lsh_recall" -> 8,
    "q19_minhash_lsh_neardup" -> 8,
    "q38_tfidf" -> 6,
    "q63_unigram_lm" -> 6,
    "q68_drift_psi" -> 5,
    // q89 (r9 occurrence form): all four residual exchanges are vocab-
    // or doc-count-sized (model fold collapses map-side to the Heaps-
    // bounded vocab before shipping, the w₁ marginal window re-keys
    // the vocab, the per-doc score fold collapses map-side, + the
    // output sort); the corpus-sized occurrences live in the pin and
    // never shuffle
    "q89_bigram_lm" -> 4,
    "q93_pagerank" -> 7,
    "q94_wau_sliding" -> 5,
    "q105_perplexity_buckets" -> 7,
    "q109_leakage_safe_split" -> 8,
    // Stat family (q129-q148): in every entry below the FIRST exchange
    // is the only corpus-sized one; the rest ride model/grid/sources-
    // sized relations by design (the audit records them so a future
    // edit can't silently widen the corpus-sized set).
    // q132: distinct (user,hr) re-key + the per-user interval window +
    // boundary fold + grid integration — grid-sized from stage 3 on
    "q132_sliding_distinct" -> 6,
    // q133: one tokenize fold; ns/cw/nn folds and the final group are
    // vocab- or sources-sized off the pinned counts
    "q133_domain_divergence" -> 6,
    // q134: two design scans' folds (text-hash + lang majority) + the
    // lang window + final sort — sources-sized after the folds
    "q134_dataset_card" -> 5,
    // q139: one corpus count fold; base/rem/leftover/rank are all
    // SOURCES-sized Hamilton arithmetic
    "q139_quota_holdout" -> 8,
    // q55 (r14): 4 audited + the 2 gated spreadSmallInput round-robin
    // exchanges (one per filtered half's kernel subtree after column
    // pruning splits the spread; same A/B-proven rationale and the
    // same nFiles<parallelism no-op-at-scale gate as q136 below;
    // measured 0.89 → 0.66 s)
    "q55_incremental_neardup" -> 6,
    // q136 (r14): 4 audited + the 2 gated spreadSmallInput round-robin
    // exchanges (the single-split corpus otherwise runs both shingle
    // kernel scans in ONE task — measured 1.11 → 0.52 s; column
    // pruning splits the spread into two pruned exchanges, and the
    // nFiles<parallelism gate makes both a NO-OP at warehouse scale,
    // so the extra text shuffles exist only where the corpus is one
    // split)
    "q136_containment" -> 6,
    // q140: the q19 band machinery (audited there at 8); the sweep
    // itself adds only a one-row conditional-sum agg
    "q140_threshold_sweep" -> 8,
    // q141: one (source,length) fold; CDF windows and the D max ride
    // the values GRID (value-domain-sized, the q119 rationale)
    "q141_ks_drift" -> 7,
    // q142: q92's window + fold; the three power iterations re-key
    // STATES-sized relations (broadcast p, groupBy next)
    "q142_stationary_markov" -> 5,
    // q143: user window for cohorts + triangle-sized folds/window
    "q143_cohort_ltv" -> 6,
    // q147: q19 pair machinery + component iterations + the survivor
    // window; at scale labels are stored columns and this collapses
    // to a docs-sized join + window (q109's policy)
    "q147_keep_best_dedup" -> 7,
    // q148: basket distinct + the basket-key pair self-join; supports,
    // rules and lift are |types|-sized folds
    "q148_association_rules" -> 7,
    // q149: one contingency fold; marginals + grand total are each a
    // cells-sized re-key off the pin, the test itself a one-row agg
    "q149_chi2_independence" -> 5,
    // q163: the corpus touches exactly two exchanges (the lang count
    // fold and the final per-lang sample fold, both map-side combined
    // to 5 rows before the wire); the other three carry the 5-row
    // weight model (tot agg, w_ppm fold, output sort)
    "q163_temperature_mix" -> 5,
    // q177: bounded-depth BFS — each hop is a frontier-keyed join +
    // distinct + visited anti-join, and every exchange after the first
    // carries FRONTIER-sized doc_id lists (edges/seeds/h1 are pinned
    // artifacts); the corpus never re-shuffles
    "q177_contamination_hops" -> 5,
    // q175: 3 exchanges per FD candidate × 5 — the (det, dep) pair
    // fold (the only one whose width tracks data, bounded by distinct
    // pair count), the per-det max re-key (distinct-det-sized), and a
    // one-ROW final fold; the union/sort of five single rows is free
    "q175_fd_profile" -> 15,
    // q167: the whole point is that NO exchange carries ranked rows —
    // the corpus crosses the wire only post-combine (grid fold and the
    // 10-row bucket fold); the remaining four ride the value-domain
    // grid (cum window, bps fold, bp-array agg, output sort)
    "q167_equidepth_hist" -> 6,
    // q203: the ONLY corpus-shaped exchange is the nationkey-block
    // self-join (pair rows γ-fold map-side to ≤ 8 patterns before the
    // wire); the other seven are the three u-folds (each a value-keyed
    // groupBy + a one-row total, all ending ≤ field-cardinality) and
    // the 8-row output sort — model-sized by construction
    "q203_record_linkage" -> 8,
    // q204: the session build rides ONE user-keyed exchange (island
    // windows + session fold share it); the incident fold re-keys
    // hour-bucket rows (span-hours-sized post-combine), the window
    // side broadcasts, and the user fold + output sort close — the
    // countDistinct expand adds the fifth
    "q204_interval_overlap_join" -> 5,
    // q208: the corpus crosses ONCE into the pinned daily fold;
    // everything downstream is grid- or types-sized by construction —
    // the pooled value-grid fold + its rank window, the ties one-row
    // fold, the per-type fold, and the Q/P one-row folds each re-key
    // tiny relations (the audit records the count so a future edit
    // can't widen the corpus-sized set past the first exchange)
    "q208_kruskal_wallis" -> 9,
    // q227/q228/q229: the corpus crosses ONCE into the daily fold;
    // everything after is types- or grid-sized by construction — the
    // per-type fold, the Qd/A one-row HOF folds and the final one-row
    // combine (q228 adds the median window, q229 the day-keyed rank
    // windows) each re-key tiny relations, exactly q208's audited shape
    "q227_anova_f" -> 6,
    "q228_brown_forsythe" -> 7,
    "q229_friedman" -> 6,
    // q238: ONE corpus-sized exchange (the pinned day fold); the pair
    // self-join and both tie folds re-key the grid-sized pin (days²
    // pairs, value-grid tie counts) and the 5-row joins + sort close
    "q238_kendall_tau" -> 6,
    // q245 (r9 interval-lookup form): the whole pipeline — posSets
    // fold, interval-bucket explode ⋈ broadcast catalog, exclusion
    // filter, sorted-slice top-3 — is ONE exchange-free chain off the
    // posSets groupBy, pinned output-sized before the sort (the range
    // sampler would re-execute the chain otherwise); the residual
    // plan is the final sort's single exchange
    "q245_negative_sampling" -> 1,
    // q250: the corpus work (tokenize + both ranking windows) lives in
    // the pin; the residual six exchanges carry the two policies'
    // (lang, batch) pad folds + their lang re-folds, the totals fold
    // and the 5-row sort — every one batch-count- or lang-sized
    "q250_length_batching" -> 6,
    // q252: both policies' audits read the pinned (label, ba, bs)
    // relation — per policy a (batch, label) fold + a batch fold + the
    // one-row fold; all batch-count-sized (the ranking windows that
    // touch the vectors live in the pin)
    "q252_inbatch_collisions" -> 6,
    // q254 (tagged-union form): the facts ride broadcast semi-joins
    // and never shuffle; the three exchanges are the 4-group audit
    // fold (map-side collapsed to distinct (table, subject)) + its
    // re-fold + the 4-row sort
    "q254_erasure_audit" -> 3,
    // q261: the user fold is the one corpus-sized exchange; the
    // horizon one-row agg, the duration-grid fold and its two global
    // windows (span-days-sized, the q141 grid rationale) + the output
    // sort make up the rest
    "q261_survival_hazard" -> 5,
    // q256 (r10 broadcast-anti form): NO corpus-sized exchange — the
    // child union probes the ONE tagged broadcast of parent key sets.
    // Pinned 7 = the four parent DISTINCTS (key-set-sized after
    // map-side combine, inside the broadcast subtree) + the
    // ORPHAN-only countDistinct two-phase fold + the 4-row sort
    "q256_fk_orphans" -> 7,
    // q263: ONE corpus-sized exchange (the (lang, term) fold, map-side
    // combined to the Heaps-bounded vocab); the per-lang rank window,
    // the 5-row spread fold + its join re-key and the output sort all
    // ride vocab- or langs-sized relations
    "q263_zipf_audit" -> 5,
    // q209: one fact-sized exchange (the (part,supplier) fold); the
    // per-part window, dominant-distinct, semi probe and output sort
    // all re-key the parts×suppliers fold — model-sized by design
    "q209_dominant_suppliers" -> 5,
    // q219 (r8 one-pass form): the detail fold + the header⋈detail
    // full-outer join are the two corpus-sized exchanges (both on the
    // shared orderkey — co-bucketing removes them at scale); ALL THREE
    // join-side checks ride ONE aggregate pass (its one-row exchange),
    // the dup-key re-count adds its fold + one-row re-fold, and the
    // 4-row union sort closes the set
    "q219_reconciliation" -> 5)
  /** Audited per-query scan counts (see the class doc). Only queries
    * whose audited plan exceeds or notably undercuts the default are
    * listed — a new query landing above DefaultMax must either be
    * restructured or have its count consciously recorded here. */
  val ScanBaseline: Map[String, Int] = Map(
    // single-scan designs the audit fought for: pin them tight
    "q61_duplicate_passages" -> 1,
    // q179 (TPC-H Q8): SEVEN base tables with nation scanned twice
    // (customer's region chain + supplier's nation role) — eight scans
    // is one per table role, the multi-table carve-out; every
    // dimension chain broadcasts (7 BroadcastExchanges, 2 shuffles:
    // the year fold + output sort)
    "q179_market_share" -> 8,
    // q175 checks five declared FD candidates: one scan per candidate,
    // each pruned to exactly its (det, dep) column pair — a pin would
    // force materializing the union of every candidate's columns, more
    // I/O than the pruned re-scans at any scale (lineitem/orders each
    // appear twice but with different 2-column ReadSchemas)
    "q175_fd_profile" -> 5,
    // q154 JOINS six base tables (TPC-H Q5 star) — six scans is one per
    // table, the class doc's multi-table carve-out, every dim broadcast
    "q154_local_supplier_volume" -> 6,
    // q222 (TPC-H Q9): five base tables, one scan each — part/supplier/
    // nation broadcast before the fact fold, fact⋈orders is the only
    // big join (the multi-table carve-out)
    "q222_profit_by_nation" -> 5,
    // q254: nine scans — four audited child relations + the deletion
    // list's customer scan + orders twice (own audit + the lineitem
    // subject resolve) + union-leg pruning re-plans; every one pruned
    // to its key column, dimension- or key-set-sized reads
    "q254_erasure_audit" -> 9,
    // q256: eight scans = one per table ROLE across the four declared
    // FK edges (the multi-table carve-out): 4 children + 4 parents
    "q256_fk_orphans" -> 8,
    // q245 (r9): the candidate chain executes at pin time (orders,
    // lineitem, part — each once; |catalog| comes from footer stats,
    // not a count job); the residual plan reads the pinned
    // output-sized top-3 — zero parquet scans
    "q245_negative_sampling" -> 0,
    // q162 (TPC-H Q7): five base tables with nation scanned TWICE — once
    // per ROLE (supplier's nation, customer's nation); both role chains
    // broadcast, so the double scan is dimension-sized by construction
    "q162_volume_shipping" -> 6,
    // q132: intervals pinned (three consumers — start/end deltas via
    // one explode, grid bounds — read the pin); events scans ONCE
    "q132_sliding_distinct" -> 1,
    "q38_tfidf" -> 2,
    // q62 reads the MEMOIZED inverted index + stats (ExistingRDD, built
    // once per (session, dir)): zero parquet scans per query
    "q62_bm25_search" -> 0,
    // q63/q105: the pinned 1-scan form measured slower than the lazy
    // 3-scan model derivation (eager checkpoint cost) — lazy stays
    "q63_unigram_lm" -> 3,
    // the IVF family reads the model's checkpointed cell-assignment
    // artifact (vectors + cell ids stored at ingest): zero parquet
    "q30_ann_ivf" -> 0,
    "q45_ann_multiprobe" -> 0,
    "q64_semantic_dedup" -> 0,
    // round-4 additions, audited tight: PQ encode and the MG sketch are
    // one scan; ADC search is codes + rerank + probe; IVF-PQ carries its
    // vectors through the shortlist (no rerank rejoin)
    "q74_pq_codes" -> 1,
    // ADC search reads the MEMOIZED stored codes (ExistingRDD, not a
    // parquet scan): only the probe row + rerank vectors scan parquet
    "q75_pq_ann" -> 2,
    "q76_knn_join" -> 0,
    "q77_merge_upsert" -> 3,
    "q78_ivfpq_ann" -> 0,
    // r10 Count-Min re-platform: ONE corpus pass folds tokens to the
    // pinned vocab-sized (lang, term, count) relation; the sketch build
    // and the probe both read the pin, so the residual plan scans no
    // parquet at all
    "q79_heavy_hitters" -> 0,
    "q80_fuzzy_join" -> 1,
    "q81_chunk_overlap" -> 1,
    "q82_sq_int8" -> 1,
    // round-5 analytics additions, audited tight: q87/q90 do all their
    // window+agg work on ONE scan and one data Exchange; q89 (r9)
    // tokenizes ONCE into the pin — model and scoring read it, so the
    // residual plan has zero parquet scans
    "q87_funnel" -> 1,
    "q88_retention" -> 1,
    "q89_bigram_lm" -> 0,
    "q90_outlier_fences" -> 1,
    "q91_random_projection" -> 1,
    "q92_transitions" -> 1,
    // q93's iterations run over the checkpoint-pinned edge list (the
    // parquet-side graph build executes once, at pin time); q94 scans
    // once for user-days and once for the horizon clip
    "q93_pagerank" -> 0,
    "q94_wau_sliding" -> 2,
    // q95: one scan trains the centroids, one is scored against them
    "q95_nearest_centroid" -> 2,
    // q96 fuses meta+feature into the decode pass; q97's sweep rides
    // one window shuffle over the interval build
    "q96_audio_features" -> 1,
    "q97_peak_concurrency" -> 1,
    // q98 fuses two STORED shortlists — the memoized inverted index and
    // the IVF-PQ probe over the checkpointed cell assignment — so the
    // whole plan reads ExistingRDD artifacts, zero parquet; q99/q100
    // follow q93's convention — their one-scan graph/shingle builds
    // execute once at localCheckpoint pin time, so the inspected plan
    // reads only the pinned relation (the unpinned q100 draft planned 6)
    "q98_hybrid_rrf" -> 0,
    "q99_triangle_coeff" -> 0,
    "q100_dup_spans" -> 0,
    // q109 pins its (memoized-label x docs) assignment once; all three
    // consumers read the checkpointed relation
    "q109_leakage_safe_split" -> 0,
    // round-6 corpus signals, audited tight: q102/q103/q106 do all
    // their work on ONE scan (q102's two-level agg, q103's doc-window +
    // fp-window, q106's shingle-window fold); q104 scans once for token
    // mass and once for the vocabulary side; q105 inherits q63's
    // documented 3-scan scoring lineage (tcnt + probs + total)
    "q102_gopher_rules" -> 1,
    "q103_winnowing" -> 1,
    "q104_vocab_growth" -> 2,
    "q105_perplexity_buckets" -> 3,
    "q106_novelty_rate" -> 1,
    "q107_collocations" -> 0,
    // q108's pinned distinct (md5, source) relation joins itself
    "q108_dup_matrix" -> 0,
    // q110's typed min-k aggregate and q111's scan-local repeat plan
    // each ride one scan
    "q110_fixed_size_sample" -> 1,
    "q111_epoch_oversample" -> 1,
    // q112's pinned sources-sized sketch relation self-pairs
    "q112_kmv_overlap" -> 0,
    // q157: the pinned slim fact lineage feeds all three lineitem
    // references — residual plan scans only orders+supplier+nation
    "q157_waiting_suppliers" -> 3,
    // q158: the one-scan Q21 rewrite — lineitem+orders+supplier+nation
    "q158_waiting_suppliers_onescan" -> 4,
    // q113: one partial-aggregable hour count + the tiny-series window
    "q113_burst_detection" -> 1,
    // q115 reads the MEMOIZED benchmark variant-key artifact: the only
    // parquet scan is the corpus side (zero benchmark-side tokenize)
    "q115_fuzzy_contamination" -> 1,
    // multi-table relational joins (one scan per table, plus documented
    // reuse): audited counts
    "q10_join_inner_equi" -> 4,
    "q48_data_quality" -> 5,
    "q51_dataprep_pipeline" -> 4,
    "q70_gap_fill" -> 3)
}
