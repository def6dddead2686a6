package graft.plans

/** The reviewed (query, rule) plan-lint allowlist, shared by the
  * `sbt test` gate (`PlanLintSweepSpec`, which also flags STALE
  * entries) and the benchmark driver (`graft.Bench`, which fails fast
  * on any UNREVIEWED finding so a plan regression can't slip through a
  * bench-only round where tests are skipped).
  *
  * Every entry was reviewed in round 6:
  *  - `single-partition-exchange` — intentional `Spread.smallSort`
  *    final orderings of known-tiny results (pair lists, reports).
  *  - `unconditioned-nested-loop` — cross joins against broadcast
  *    sub-row frames (k-means centroid sets, 1-row aggregates); the
  *    "nested loop" is k× or 1× per row, not |L|·|R|.
  *  - `scan-without-pushed-filters` — predicates parquet can never
  *    push: modulo fixtures (`id % 17 = 0`), deterministic md5-bucket
  *    sampling, array-size guards.
  */
object PlanLintAllowlist {
  val allowed: Set[(String, String)] = Set(
    // r10: every ranked row crosses the broadcast 1-row doc count for
    // the 4-phase floor split (q_token_budget pattern)
    "q_curriculum" -> "unconditioned-nested-loop",
    // r11: the ≤7-row per-hop coverage curve crosses the broadcast
    // 1-row graph-node total for the reach-ppm denominator
    // (q_token_budget pattern)
    "q_seed_expansion" -> "unconditioned-nested-loop",
    // r14: the 4-row per-radius N(r) curve crosses the broadcast
    // 1-row (nf_total, nf_zero) aggregate for the mean-distance
    // denominator and the 90% threshold (q_seed_expansion's twin)
    "q_graph_diameter" -> "unconditioned-nested-loop",
    // r11: every bigram-type row crosses the broadcast 1-row (N, V)
    // corpus-totals aggregate for the interpolation backstop
    // (q_token_budget pattern; q_perplexity's vocab cross twin)
    "q_perplexity_backoff" -> "unconditioned-nested-loop",
    // r15: the same 1-row broadcast cross — KN's N1+(·,·) total-type
    // count against every bigram-type row (the backoff twin above)
    "q_perplexity_kn" -> "unconditioned-nested-loop",
    // r10: the D-row broadcast domain fan-out (eval bigrams × every
    // train LM — the definition of a D×D matrix) plus the D-row
    // per-domain vocabulary broadcast (q_token_budget pattern)
    "q_domain_xent" -> "unconditioned-nested-loop",
    // r10: same matrix fan-out feeding the weights, plus the 1-row
    // margin-total aggregate crossed back over D rows
    "q_domain_mix" -> "unconditioned-nested-loop",
    // r9: the Bloom prefilter IS the probe-side predicate — a
    // broadcast-filter UDF parquet can never push (the pruning
    // happens post-scan by design; the win is the avoided SHUFFLE,
    // not the scan — see operators/BloomJoin)
    "q_bloom_join" -> "scan-without-pushed-filters",
    // r10: Q22's country-code predicate is c_nationkey % 10 IN (…) —
    // a modulo derivation parquet can never push (the fixture has no
    // phone column to prefix-match; same class as the id % 17 entries)
    "q_tpch_22" -> "scan-without-pushed-filters",
    // r9: deliberate 1-row × 1-row cross of the (n, agree) aggregate
    // and the Σrow·col margin aggregate (q_sketch_setops pattern)
    "q_kappa" -> "unconditioned-nested-loop",
    // r9: 1-row assortativity aggregate crossed with the 1-row node
    // count (q_sketch_setops pattern)
    "q_graph_stats" -> "unconditioned-nested-loop",
    // r9: every |domains| row crosses the broadcast 1-row corpus
    // total (q_temporal_split pattern)
    "q_token_budget" -> "unconditioned-nested-loop",
    // r8: rank/cum-share window over the 10 TakeOrdered-selected rows
    // crossed with the broadcast 1-row key-stats aggregate (the
    // window's single-partition requirement is satisfied by the
    // limit's existing collect — no extra exchange appears)
    "q_key_skew" -> "unconditioned-nested-loop",
    // r8: deliberate 1-row × 1-row cross of the CMS estimate and the
    // exact grouped-count aggregate (q_sketch_setops pattern)
    "q_join_size_est" -> "unconditioned-nested-loop",
    // r8: doc_id % 2 even/odd batch fixtures (q_minhash_incr pattern).
    // (The r8 "unconditioned-nested-loop" entry went stale in r9: the
    // distributed denseRankIds ranking restructured the fresh-token
    // branch so the 1-row next-id cross no longer surfaces.)
    "q_vocab_incr" -> "scan-without-pushed-filters",
    // r8: intentional Spread.smallSort of the per-doc score report
    // (same as q_decontam's own entry)
    "q_stream_decontam" -> "single-partition-exchange",
    // r9: intentional Spread.smallSort of the per-doc score report
    // (same as q_stream_decontam above)
    "q_stream_perplexity" -> "single-partition-exchange",
    // r8: every row crosses the broadcast 1-row (lo, hi) time-bounds
    // aggregate — 1× per row, not |L|·|R|
    "q_temporal_split" -> "unconditioned-nested-loop",
    "q_agg_incremental" -> "scan-without-pushed-filters",
    "q_bloom_decontam" -> "single-partition-exchange",
    // r7: malformed-interval guard (s <= e) is on derived columns —
    // nothing for parquet to push
    "q_interval_overlap" -> "scan-without-pushed-filters",
    // r7: size(split(text)) >= n array-size guard, same category as
    // q_chunks; the gram explode can't be pushed anyway
    "q_boilerplate" -> "scan-without-pushed-filters",
    // r7: vec_id % 25 = 0 modulo query fixture, same as q_sample_det
    "q_contrastive" -> "scan-without-pushed-filters",
    // r7: c_custkey % 5/7 modulo fixtures building the SCD2 versions
    "q_pit_join" -> "scan-without-pushed-filters",
    // r7: p_partkey % 2 modulo fixture; the "nested loop" is the
    // deliberate 1-row × 1-row cross of the two sketch aggregates
    "q_sketch_setops" -> "scan-without-pushed-filters",
    "q_sketch_setops" -> "unconditioned-nested-loop",
    // r7: o_orderkey % 2 run-split fixture; broadcast cross of the
    // 1-row totals frame against ≤bins histogram rows
    "q_drift_report" -> "scan-without-pushed-filters",
    "q_drift_report" -> "unconditioned-nested-loop",
    // r7: vec_id % 50 query fixture; k-means assignment crosses each
    // point with the broadcast k-row centroid set (same as
    // q_kmeans_assign)
    "q_knn_ivf_learned" -> "scan-without-pushed-filters",
    "q_knn_ivf_learned" -> "unconditioned-nested-loop",
    "q_knn_ivf_probe2" -> "scan-without-pushed-filters",
    "q_knn_ivf_probe2" -> "unconditioned-nested-loop",
    // r10: the recall evaluator runs the SAME probe2 chain (modulo
    // query fixture + broadcast k-row centroid cross) as its approx
    // side — identical findings, identical rationale
    "q_ann_recall_probe2" -> "scan-without-pushed-filters",
    "q_ann_recall_probe2" -> "unconditioned-nested-loop",
    // (q_pq_adc's r15 scan-without-pushed-filters entry went stale in
    // r17: the fixed vec_id < 100 query sample PUSHES to parquet,
    // unlike the old % 50 fixture — same for q_pq_train's)
    // r15: the IVF-PQ composition inherits both halves' reviewed
    // findings — the modulo query fixture and the k-means point ×
    // broadcast k-row centroid cross (the q_knn_ivf_learned entries)
    "q_pq_ivf" -> "scan-without-pushed-filters",
    "q_pq_ivf" -> "unconditioned-nested-loop",
    // r16: multi-probe and residual IVF-PQ run the q_pq_ivf chain
    // (same modulo query fixture, same point × broadcast k-row
    // centroid cross — assignTopN / residual subtraction add no new
    // join shapes); trained PQ adds the Lloyd rounds, whose only
    // cross is the subvector × broadcast m·k-codeword scoring
    "q_pq_ivf_probe2" -> "scan-without-pushed-filters",
    "q_pq_ivf_probe2" -> "unconditioned-nested-loop",
    "q_pq_residual" -> "scan-without-pushed-filters",
    "q_pq_residual" -> "unconditioned-nested-loop",
    // r16: the incremental index runs the q_pq_adc chain with a
    // mod-4 seed filter (modulo is not parquet-pushable)
    "q_pq_incr" -> "scan-without-pushed-filters",
    // r7: BM25 crosses each posting with the broadcast 1-row corpus
    // stats (n_docs, total_len) — 1× per row, not |L|·|R|. (In
    // q_hybrid_rrf the same cross sits behind the materialized result
    // cache, so the sweep doesn't observe it there.)
    "q_bm25" -> "unconditioned-nested-loop",
    // r7: o_orderkey % 5/7/10/13 modulo fixtures building the CDC log
    "q_cdc_apply" -> "scan-without-pushed-filters",
    // r7: DSIR weights cross each doc with the broadcast 1-row corpus
    // totals (r_total, t_total)
    "q_importance" -> "unconditioned-nested-loop",
    // r9: bigram-LM scoring crosses each (doc, bigram) group with the
    // broadcast 1-row vocabulary-size aggregate — 1× per row, not
    // |L|·|R| (same shape as q_importance / q_bm25)
    "q_perplexity" -> "unconditioned-nested-loop",
    // r9: the NB smoothing/prior spines cross words (and docs) with
    // the broadcast class list and 1-row totals — |classes|× per row
    // by design (the add-one model needs unseen (word, class) pairs),
    // same category as q_kmeans_assign's centroid cross
    "q_nb_classify" -> "unconditioned-nested-loop",
    // r9: same NB class-spine crosses, plus the doc_id % 2 train/test
    // modulo fixture (q_minhash_incr category)
    "q_nb_holdout" -> "unconditioned-nested-loop",
    "q_nb_holdout" -> "scan-without-pushed-filters",
    // r7: PMI crosses the ≤|types|² pair counts with the broadcast
    // 1-row distinct-user total
    "q_pmi_cooc" -> "unconditioned-nested-loop",
    "q_chunks" -> "scan-without-pushed-filters",
    "q_chunks" -> "single-partition-exchange",
    "q_containment" -> "single-partition-exchange",
    "q_decontam" -> "scan-without-pushed-filters",
    "q_decontam" -> "single-partition-exchange",
    "q_dedup_embed" -> "single-partition-exchange",
    // r10: smallSort of the verified pair list (one pair per planted
    // copy — n rows, report-sized)
    "q_dedup_embed_lsh" -> "single-partition-exchange",
    // r10: recall report — two 1-row aggregates attached by a scalar
    // cross (the reviewed 1-row broadcast shape)
    "q_srp_recall" -> "unconditioned-nested-loop",
    // r10: same report-sized smallSort over the probe-batch pairs;
    // the index side is scan-only BY CONTRACT (banding + verify each
    // read the whole saved index — no predicate exists to push; at
    // scale it lives in storage and is never cached)
    "q_embed_incr" -> "single-partition-exchange",
    "q_embed_incr" -> "scan-without-pushed-filters",
    "q_dedup_minhash" -> "single-partition-exchange",
    "q_dedup_ngram" -> "single-partition-exchange",
    "q_dedup_simhash" -> "single-partition-exchange",
    "q_dup_spans" -> "single-partition-exchange",
    "q_kmeans_assign" -> "unconditioned-nested-loop",
    "q_kmeans_update" -> "scan-without-pushed-filters",
    "q_kmeans_update" -> "unconditioned-nested-loop",
    "q_max_spans" -> "single-partition-exchange",
    "q_minhash_incr" -> "single-partition-exchange",
    "q_mixture" -> "single-partition-exchange",
    "q_quality_filter" -> "single-partition-exchange",
    "q_range_join" -> "scan-without-pushed-filters",
    "q_repetition" -> "single-partition-exchange",
    "q_sample_det" -> "scan-without-pushed-filters",
    "q_sample_strat" -> "scan-without-pushed-filters",
    "q_scd2" -> "scan-without-pushed-filters",
    "q_scd2" -> "single-partition-exchange",
    "q_sem_decontam" -> "single-partition-exchange",
    "q_semdedup" -> "single-partition-exchange",
    "q_semdedup" -> "unconditioned-nested-loop",
    // r10: same two reviewed shapes as q_semdedup — the broadcast
    // centroid cross (k sub-row frame per point) and the smallSort
    // of the per-point verdict report
    // r10: smallSort of the 1.6k-node hub/authority report (the
    // in-loop score frames are checkpoint-truncated, report-sized)
    "q_hits" -> "single-partition-exchange",
    // r17: the warm start's smallSort of the same report (identical
    // shape to q_hits — the saved-artifact join adds no exchange);
    // the delete twin is the same plan over the retracted pair set
    "q_hits_incr" -> "single-partition-exchange",
    "q_hits_delete" -> "single-partition-exchange",
    // r17: the q_pq_ivf/residual centroid cross at the IVFADC
    // composition — every vector crosses the broadcast 8-row coarse
    // centroid frame for assignment (k× per row, not |L|·|R|); the
    // fixed vec_id < 100 query filter PUSHES, so the family's usual
    // scan-without-pushed-filters entry does not recur here
    "q_pq_ivfadc" -> "unconditioned-nested-loop",
    // r18: the identical chain over the checkpointed clusterable
    // mixture — same broadcast 8-row coarse-centroid cross (k× per
    // row, not |L|·|R|); the corpus projection needs every row so
    // there is no filter to push beneath the checkpoint
    "q_pq_ivfadc_mix" -> "unconditioned-nested-loop",
    // r17: SQ8 ADC crosses every vector with the broadcast 1-row
    // per-dim ranges-arrays frame (the q_token_budget pattern), and
    // the dimRanges posexplode infers a size() guard parquet can
    // never push (the documented r9 generate-inference class)
    "q_vec_sq_adc" -> "unconditioned-nested-loop",
    "q_vec_sq_adc" -> "scan-without-pushed-filters",
    // r18: the IVF×SQ8 composition keeps q_vec_sq_adc's broadcast
    // 1-row ranges cross (and the 8-row centroid assignment cross);
    // its SCORED join is the cell equi-join — the nested loop here
    // is only the k-row/1-row broadcast frames
    "q_vec_sq_ivf" -> "unconditioned-nested-loop",
    // r18: the BQ/MRL ByCell siblings keep only the 8-row centroid
    // assignment cross — their scored joins are the cell equi-join
    "q_vec_bq_ivf" -> "unconditioned-nested-loop",
    "q_ann_mrl_ivf" -> "unconditioned-nested-loop",
    // r18: the SQ8 index append crosses the batch with the broadcast
    // 1-row saved-ranges frame and scans against the broadcast
    // per-query weight frame (q_vec_sq_adc's reviewed shapes over
    // the staged artifact); the mod-4 batch filter is the documented
    // unpushable-mod class
    "q_vec_sq_incr" -> "unconditioned-nested-loop",
    "q_vec_sq_incr" -> "scan-without-pushed-filters",
    // r18: the BQ append's mod-4 batch filter — same unpushable-mod
    // class; the hamming scan itself is the reviewed broadcast
    // qcodes join
    "q_vec_bq_incr" -> "scan-without-pushed-filters",
    // r10: every rule row crosses the broadcast 1-row basket-count
    // aggregate (q_token_budget pattern) + smallSort of the rule
    // report (one row per recurring pair direction)
    "q_assoc_rules" -> "unconditioned-nested-loop",
    "q_assoc_rules" -> "single-partition-exchange",
    // r10: smallSort of the per-node component report (the peel
    // loop's frames are checkpoint-truncated, node-sized)
    "q_scc" -> "single-partition-exchange",
    // r10: same smallSort over the 1.3k cross-component edge report
    "q_scc_condense" -> "single-partition-exchange",
    "q_semdedup_auto" -> "single-partition-exchange",
    "q_semdedup_auto" -> "unconditioned-nested-loop",
    // r10: same two reviewed shapes — the point × broadcast-coarse
    // cross (coarseK sub-rows per point) and the verdict smallSort
    "q_semdedup_hier" -> "single-partition-exchange",
    "q_semdedup_hier" -> "unconditioned-nested-loop",
    // r10: batch × broadcast-centroid cross + verdict smallSort (the
    // q_semdedup shapes; the corpus probe itself is an equi-join)
    "q_semdedup_incr" -> "single-partition-exchange",
    "q_semdedup_incr" -> "unconditioned-nested-loop",
    // r10: point × broadcast-centroid cross (k sub-rows per point)
    // + smallSort of the k-row cluster report
    "q_silhouette" -> "single-partition-exchange",
    "q_silhouette" -> "unconditioned-nested-loop",
    "q_seq_pack" -> "single-partition-exchange",
    "q_snapshot_diff" -> "scan-without-pushed-filters",
    "q_snapshot_diff" -> "single-partition-exchange",
    // r7: streaming near-dup pair list — intentional smallSort of a
    // known-tiny result, same as the other dedup pair queries
    "q_stream_neardup" -> "single-partition-exchange",
    // r10: same reviewed shape as q_stream_neardup — the smallSort of
    // the drained cross-batch pair report
    "q_stream_embed_neardup" -> "single-partition-exchange",
    "q_tfidf" -> "single-partition-exchange",
    "q_union_evolve" -> "scan-without-pushed-filters",
    "q_upsert" -> "scan-without-pushed-filters",
    "q_zorder" -> "scan-without-pushed-filters",
    "q_zorder" -> "single-partition-exchange")
}
