"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ray.init()/ray.shutdown().

The library under test: ``libpostal_ray`` — a Ray-Data-native near-duplicate
detection + clustering engine (the reference's normalize->block->verify
philosophy re-expressed for document/source-code content; SURVEY.md).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: near-dup clustering of the sf0.001 documents
    table; returns the cluster-assignment Dataset."""
    from libpostal_ray.pipelines.queries import near_dupe_clusters

    return near_dupe_clusters("/root/testdata/sf0.001")


def _prepare_training_corpus(sf_dir: str):
    from libpostal_ray.pipelines.prepare import prepare_training_corpus

    return prepare_training_corpus(sf_dir)


def _train_code_lang(sf_dir: str):
    from libpostal_ray.pipelines.train import train_code_lang

    return train_code_lang(sf_dir)


def _license_tagger(sf_dir: str):
    from libpostal_ray.pipelines.tagger import license_tagger

    return license_tagger(sf_dir)


def _license_tagger_crf(sf_dir: str):
    from libpostal_ray.pipelines.tagger import license_tagger_crf

    return license_tagger_crf(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from libpostal_ray.pipelines import queries as q

    return {
        # oracle-checked (SQL-expressible).
        # ROTATION (round 5): the driver gate verifies the FIRST 50
        # oracle entries.  Rounds 1-4 cumulatively driver-verified 100
        # rows (r04 green 50/50 over blocks 0 + 1-head).  Per the
        # round-4 verdict's directive #1 the first 50 slots below are
        # the OLDEST never-driver-checked debt: the block-1 tail (9,
        # incl. the three LLM-slate rows events_zorder /
        # cosine_threshold_calibration / dedup_eval_prefix_vs_exact
        # named by directive #6), block 1b (3), block 1c (34), and the
        # head of block 1d (4) — zero already-checked rows waste a
        # slot.  After r05 the cumulative count is 150/182+; the
        # remaining 1d tail + 1e/1f/1g rows stay continuously green in
        # the repo parity suite at sf0.001/0.01/0.1 (they follow
        # immediately after the gate, oldest first, should a further
        # rotation ever run).
        # --- ROUND-5 GATE head: block 1 tail (9) ---
        "source_top_lang": q.source_top_lang,
        "event_type_distinct_users": q.event_type_distinct_users,
        "user_value_trend": q.user_value_trend,
        "segment_revenue_share": q.segment_revenue_share,
        "events_zorder": q.events_zorder,
        "cosine_threshold_calibration": q.cosine_threshold_calibration,
        "dedup_eval_prefix_vs_exact": q.dedup_eval_prefix_vs_exact,
        "attribution_pairs": q.attribution_pairs,
        "global_event_ranks": q.global_event_ranks,
        # --- ROUND-5 GATE: block 1b (3) ---
        "user_event_diversity": q.user_event_diversity,
        "tpch_q3_top_orders": q.tpch_q3_top_orders,
        "term_postings": q.term_postings,
        # --- ROUND-5 GATE: block 1c (34) ---
        "tpch_q13_custdist": q.tpch_q13_custdist,
        "tpch_q4_late_shipments": q.tpch_q4_late_shipments,
        "user_longest_streak": q.user_longest_streak,
        "user_interevent_median": q.user_interevent_median,
        "event_value_deciles": q.event_value_deciles,
        "segment_acctbal_gini": q.segment_acctbal_gini,
        "customer_rfm": q.customer_rfm,
        "event_nearest_order": q.event_nearest_order,
        "documents_profile_drift": q.documents_profile_drift,
        "user_out_of_order_events": q.user_out_of_order_events,
        "events_daily_autocorr": q.events_daily_autocorr,
        "source_mixture_weights": q.source_mixture_weights,
        "dup_cluster_histogram": q.dup_cluster_histogram,
        "events_anomaly_hours": q.events_anomaly_hours,
        "order_fulfillment_lag": q.order_fulfillment_lag,
        "tpch_q6_forecast_revenue": q.tpch_q6_forecast_revenue,
        "tpch_q10_returned": q.tpch_q10_returned,
        "tpch_q14_promo_share": q.tpch_q14_promo_share,
        "part_cheapest_supplier": q.part_cheapest_supplier,
        "lang_type_token_ratio": q.lang_type_token_ratio,
        "rolling_active_users": q.rolling_active_users,
        "click_to_purchase_median": q.click_to_purchase_median,
        "user_value_pareto": q.user_value_pareto,
        "source_dup_rate": q.source_dup_rate,
        "stratified_fixed_k_sample": q.stratified_fixed_k_sample,
        "lineitem_rate_grid": q.lineitem_rate_grid,
        "orders_weekday_seasonality": q.orders_weekday_seasonality,
        "tpch_q7_nation_volume": q.tpch_q7_nation_volume,
        "tpch_q21_waiting_suppliers": q.tpch_q21_waiting_suppliers,
        "tpch_q8_market_share": q.tpch_q8_market_share,
        "tpch_q15_top_supplier": q.tpch_q15_top_supplier,
        "tpch_q17_small_quantity_revenue": q.tpch_q17_small_quantity_revenue,
        "tpch_q19_bracket_revenue": q.tpch_q19_bracket_revenue,
        # --- ROUND-5 GATE: block 1d head (5) — completes the 50
        # (bpe_fertility_by_lang is rows-only, so the gate takes one
        # extra 1d row rather than waste an oracle slot) ---
        "tpch_q18_large_orders": q.tpch_q18_large_orders,
        "tpch_q16_supplier_counts": q.tpch_q16_supplier_counts,
        "tpch_q22_dormant_customers": q.tpch_q22_dormant_customers,
        "tpch_q9_product_profit": q.tpch_q9_product_profit,
        "tpch_q11_important_parts": q.tpch_q11_important_parts,
        # ================= past the 50-row gate =================
        # never driver-checked (parity-green), oldest first:
        # --- block 1c rows-only straggler + block 1d tail (8) ---
        "bpe_fertility_by_lang": q.bpe_fertility_by_lang,
        "orders_totalprice_recon": q.orders_totalprice_recon,
        "orders_benford": q.orders_benford,
        "event_type_user_overlap": q.event_type_user_overlap,
        "lineitem_corr_matrix": q.lineitem_corr_matrix,
        "documents_expectations": q.documents_expectations,
        "lang_source_contingency": q.lang_source_contingency,
        "events_type_mad": q.events_type_mad,
        "event_trigrams": q.event_trigrams,
        # --- block 1e: new in round-4 session 15, never driver-checked ---
        "orders_mom_growth": q.orders_mom_growth,
        "customer_cohort_orders": q.customer_cohort_orders,
        "part_major_suppliers": q.part_major_suppliers,
        "tpch_q12_shipping_lag": q.tpch_q12_shipping_lag,
        "user_type_runs": q.user_type_runs,
        "event_value_zscore": q.event_value_zscore,
        "doc_graph_bfs_levels": q.doc_graph_bfs_levels,
        "doc_graph_triangles": q.doc_graph_triangles,
        "sorted_neighborhood_pairs": q.sorted_neighborhood_pairs,
        "user_time_weighted_value": q.user_time_weighted_value,
        "events_cusum_changepoint": q.events_cusum_changepoint,
        "linkage_agreement_patterns": q.linkage_agreement_patterns,
        # --- block 1f: new in round-4 session 17, never driver-checked ---
        "source_length_ks": q.source_length_ks,
        "events_mannwhitney": q.events_mannwhitney,
        # --- block 1g: new in round-4 session 18, never driver-checked ---
        "doc_graph_sssp": q.doc_graph_sssp,
        "tpch_q2_min_cost_supplier": q.tpch_q2_min_cost_supplier,
        "event_click_auc": q.event_click_auc,
        "event_value_ols2": q.event_value_ols2,
        "user_survival_km": q.user_survival_km,
        "value_decile_calibration": q.value_decile_calibration,
        "event_type_top_values": q.event_type_top_values,
        "events_grouping_sets": q.events_grouping_sets,
        "events_quantile_normalize": q.events_quantile_normalize,
        "similar_doc_degree": q.similar_doc_degree,
        # --- block 1h: new in round-5 session 19 (privacy-audit family
        # + novelty scoring) ---
        "events_k_anonymity": q.events_k_anonymity,
        "events_l_diversity": q.events_l_diversity,
        "events_dp_type_counts": q.events_dp_type_counts,
        "doc_ngram_novelty": q.doc_ngram_novelty,
        "user_event_regex": q.user_event_regex,
        # --- block 0: rows driver-green in r04 (29) ---
        "events_since_signup": q.events_since_signup,
        "event_type_octiles": q.event_type_octiles,
        "part_association_rules": q.part_association_rules,
        "documents_checksum": q.documents_checksum,
        "part_pair_counts": q.part_pair_counts,
        "user_behavior_profiles": q.user_behavior_profiles,
        "doc_chain_ranks": q.doc_chain_ranks,
        "event_value_winsorized": q.event_value_winsorized,
        "doc_chunk_windows": q.doc_chunk_windows,
        "order_price_allocation": q.order_price_allocation,
        "user_busy_intervals": q.user_busy_intervals,
        "event_transitions": q.event_transitions,
        "user_retention_daily": q.user_retention_daily,
        "user_value_hourly_ffill": q.user_value_hourly_ffill,
        "lang_chain_components": q.lang_chain_components,
        "order_skyline": q.order_skyline,
        "name_typo_pairs": q.name_typo_pairs,
        "user_top_event": q.user_top_event,
        "doc_dir_rollup": q.doc_dir_rollup,
        "top_collocations": q.top_collocations,
        "returnflag_weighted_median": q.returnflag_weighted_median,
        "events_type_median_exact": q.events_type_median_exact,
        "weighted_doc_sample": q.weighted_doc_sample,
        "source_ngram_overlap": q.source_ngram_overlap,
        "similar_doc_pairs": q.similar_doc_pairs,
        "pack_sequences": q.pack_sequences,
        "scrub_boilerplate_tokens": q.scrub_boilerplate_tokens,
        "eval_overlap_pairs": q.eval_overlap_pairs,
        "similar_docs_topk": q.similar_docs_topk,
        # --- block 1 head: rows driver-green in r04 (21) ---
        "stratified_sample": q.stratified_sample,
        "orders_above_customer_avg": q.orders_above_customer_avg,
        "lineitem_unpivot": q.lineitem_unpivot,
        "tpch_q5_local_revenue": q.tpch_q5_local_revenue,
        "export_training_shards": q.export_shards_summary,
        "doc_rarity_score": q.doc_rarity_score,
        "label_centroids": q.label_centroids,
        "user_funnel": q.user_funnel,
        "documents_upsert": q.documents_upsert,
        "brand_type_margin": q.brand_type_margin,
        "event_debounce": q.event_debounce,
        "events_value_p99_outliers": q.events_value_p99_outliers,
        "events_value_mad": q.events_value_mad,
        "embedding_quantize_int8": q.embedding_quantize_int8,
        "user_order_full_outer": q.user_order_full_outer,
        "documents_snapshot_diff": q.documents_snapshot_diff,
        "user_activity_histogram": q.user_activity_histogram,
        "documents_profile": q.documents_profile,
        "priority_price_iqr": q.priority_price_iqr,
        "documents_scd2": q.documents_scd2,
        "embedding_covariance": q.embedding_covariance,
        # --- block 2: representative core, driver-green in r01-r03 (20) ---
        "exact_dedup": q.exact_dedup,
        "canonicalize_basic": q.canonicalize_basic,
        "token_count": q.token_count,
        "quality_stats": q.quality_stats,
        "word_jaccard_pairs": q.word_jaccard_pairs,
        "edit_distance_pairs": q.edit_distance_pairs,
        "quality_filter": q.quality_filter,
        "customer_order_ranks": q.customer_order_ranks,
        "redact_docs": q.redact_docs,
        "users_with_both": q.users_with_both,
        "lineitem_q1_full": q.lineitem_q1_full,
        "events_hourly": q.events_hourly,
        "ann_topk": q.ann_topk,
        "embedding_dups": q.embedding_dups,
        "supplier_nation_agg": q.supplier_nation_agg,
        "exact_copy_coclustering": q.exact_copy_coclustering,
        "event_order_asof": q.event_order_asof,
        "tfidf_top_terms": q.tfidf_top_terms,
        "customers_without_orders_bloom": q.customers_without_orders_bloom,
        "priority_price_quantiles": q.priority_price_quantiles,
        # --- block 3: driver-green in r01-r03, past the 50-row gate (30) ---
        "lang_count": q.lang_count,
        "ngram_shingles": q.ngram_shingles,
        "doc_token_positions": q.doc_token_positions,
        "boilerplate_ngrams": q.boilerplate_ngrams,
        "customer_order_frames": q.customer_order_frames,
        "event_value_histogram": q.event_value_histogram,
        "orders_by_month": q.orders_by_month,
        "props_key_stats": q.props_key_stats,
        "user_event_pivot": q.user_event_pivot,
        "users_without": q.users_without,
        "lineitem_agg": q.lineitem_agg,
        "top_events_by_value": q.top_events_by_value,
        "distinct_users": q.distinct_users,
        "mktsegment_order_stats": q.mktsegment_order_stats,
        "bpe_token_count": q.bpe_token_count,
        "user_sessions": q.user_sessions,
        "click_attribution": q.click_attribution,
        "events_sliding": q.events_sliding,
        "hash_sample": q.hash_sample,
        "lang_top_docs": q.lang_top_docs,
        "order_customer_nation": q.order_customer_nation,
        "customers_without_orders": q.customers_without_orders,
        "nation_customer_names": q.nation_customer_names,
        "all_party_names": q.all_party_names,
        "customers_with_big_order": q.customers_with_big_order,
        "repetition_stats": q.repetition_stats,
        "lineitem_rollup": q.lineitem_rollup,
        "orders_cube": q.orders_cube,
        "contamination_flags": q.contamination_flags,
        "contamination_ngram": q.contamination_ngram,
        # rows-only (not SQL-expressible: sketches / LSH / clustering)
        "tiered_dedup_report": q.tiered_dedup_report,
        "near_dupe_clusters": q.near_dupe_clusters,
        "cdc_chunk_dups": q.cdc_chunk_dups,
        "chunk_containment_pairs": q.chunk_containment_pairs,
        "minhash_lsh_edges": q.minhash_lsh_edges,
        "near_dupe_hash_keys": q.near_dupe_hash_keys,
        "simhash64": q.simhash64,
        "langid": q.langid,
        "fingerprint_counts": q.fingerprint_counts,
        "substring_spans": q.substring_spans,
        "ann_topk_lsh": q.ann_topk_lsh,
        "ann_topk_ivf": q.ann_topk_ivf,
        "ann_topk_ivf_sq8": q.ann_topk_ivf_sq8,
        "mmr_topk": q.mmr_topk,
        "cluster_size_topk": q.cluster_size_topk,
        "simhash_dup_pairs": q.simhash_dup_pairs,
        "hot_buckets": q.hot_buckets,
        "dedup_report": q.dedup_report,
        "near_dupe_clusters_with_spans": q.near_dupe_clusters_with_spans,
        "expand_multi_forms": q.expand_multi_forms,
        "approx_distinct_users_hll": q.approx_distinct_users_hll,
        "heavy_hitter_tokens": q.heavy_hitter_tokens,
        "user_event_count_cms": q.user_event_count_cms,
        "prepare_training_corpus": _prepare_training_corpus,
        "incremental_dedup": q.incremental_dedup,
        "approx_price_quantiles": q.approx_price_quantiles,
        "media_feature_extract": q.media_feature_extract,
        "media_frame_sample": q.media_frame_sample,
        "train_code_lang": _train_code_lang,
        "license_tagger": _license_tagger,
        # CRF/Viterbi layer over the same feature templates (the
        # reference's crf.c decoder; round-5 directive #4)
        "license_tagger_crf": _license_tagger_crf,
        "semantic_dedup": q.semantic_dedup,
        "near_dupe_pagerank": q.near_dupe_pagerank,
        "doc_lm_perplexity": q.doc_lm_perplexity,
        "embedding_pca2": q.embedding_pca2,
        "bpe_train_merges": q.bpe_train_merges,
        "bpe_compression": q.bpe_compression,
        "refresh_dedup_cycle": q.refresh_dedup_cycle,
        "user_value_p50_sketch": q.user_value_p50_sketch,
        # iterative graph primitives #4/#5 (Boruvka hooking, peel waves)
        "doc_graph_mst": q.doc_graph_mst,
        "doc_graph_kcore": q.doc_graph_kcore,
        # EM fixpoint over exact pattern counts (not SQL-expressible)
        "linkage_fs_em": q.linkage_fs_em,
        # iterative graph primitive #6 (locally-dominant greedy matching)
        "doc_graph_matching": q.doc_graph_matching,
        # iterative graph primitive #8 (synchronous label propagation)
        "doc_graph_communities": q.doc_graph_communities,
        # iterative graph primitive #9 (Weisfeiler-Lehman refinement)
        "doc_graph_wl_colors": q.doc_graph_wl_colors,
        # iterative graph primitive #10 (HITS hubs/authorities)
        "doc_graph_hits": q.doc_graph_hits,
        # iterative graph primitive #11 (Brandes betweenness, source-parallel
        # sweeps over a broadcast CSR)
        "doc_graph_betweenness": q.doc_graph_betweenness,
        # greedy max-coverage data selection (coreset pick; sequential
        # greedy recursion is not SQL — pinned vs reference in tests)
        "coverage_select_docs": q.coverage_select_docs,
        # Poisson bootstrap (one-pass B-replicate resampling, exact int
        # sufficient statistics; the resampling loop is not SQL)
        "events_bootstrap_ci": q.events_bootstrap_ci,
        # exact-integer PAVA (pooling recursion is not SQL)
        "events_isotonic_daily": q.events_isotonic_daily,
        # the embedding_dups SCALE plan forced on (approximate by design:
        # bucketed LSH pair emission; the exact brute plan is the oracle row)
        "embedding_dups_bucketed": lambda d: q.embedding_dups(d, brute_max=0),
    }


def oracle_sql() -> dict[str, str]:
    # Morton-interleave expression for events_zorder, generated rather
    # than hand-typed (32 exact-integer bit terms)
    _zx = " + ".join(f"(((x >> {i}) & 1) << {2 * i})" for i in range(16))
    _zy = " + ".join(f"(((y >> {i}) & 1) << {2 * i + 1})" for i in range(16))
    _zexpr = f"({_zx} + {_zy})"
    return {
        "events_since_signup": """
            WITH s AS (
                SELECT user_id, event_id, ts,
                       SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS grp
                FROM events
            )
            SELECT event_id,
                   CAST(row_number() OVER (PARTITION BY user_id, grp
                                           ORDER BY ts, event_id) - 1
                        AS BIGINT) AS n_since
            FROM s
        """,
        "event_type_octiles": """
            WITH a AS (
                SELECT event_type,
                       quantile_cont(value, [0.125, 0.25, 0.375, 0.5,
                                             0.625, 0.75, 0.875]) AS vs
                FROM events GROUP BY event_type
            )
            SELECT event_type,
                   unnest([0.125, 0.25, 0.375, 0.5,
                           0.625, 0.75, 0.875]) AS q,
                   unnest(vs) AS q_value
            FROM a
        """,
        "part_association_rules": """
            WITH d AS (
                SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
            ), n AS (
                SELECT count(DISTINCT k) AS nn FROM d
            ), ic AS (
                SELECT p, count(*) AS c FROM d GROUP BY p
            ), pr AS (
                SELECT a.p AS pa, b.p AS pb, count(*) AS nab
                FROM d a JOIN d b ON a.k = b.k AND a.p < b.p
                GROUP BY a.p, b.p HAVING count(*) >= 2
            )
            SELECT pr.pa AS part_a, pr.pb AS part_b, pr.nab AS n_ab,
                   ROUND((pr.nab * n.nn) / (ia.c * ib.c), 6) AS lift
            FROM pr
            CROSS JOIN n
            JOIN ic ia ON ia.p = pr.pa
            JOIN ic ib ON ib.p = pr.pb
        """,
        "documents_checksum": """
            SELECT count(*) AS n_rows,
                   CAST(bit_xor(md5_number_lower(text)
                                & 9223372036854775807::UBIGINT) AS BIGINT) AS fp
            FROM documents
        """,
        "part_pair_counts": """
            WITH d AS (
                SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
            )
            SELECT a.p AS part_a, b.p AS part_b, count(*) AS n_orders
            FROM d a JOIN d b ON a.k = b.k AND a.p < b.p
            GROUP BY a.p, b.p
        """,
        "user_behavior_profiles": """
            WITH c AS (
                SELECT user_id, event_type FROM events
                GROUP BY user_id, event_type HAVING count(*) >= 15
            ), p AS (
                SELECT user_id,
                       array_to_string(list_sort(list(event_type)), ',') AS profile
                FROM c GROUP BY user_id
            )
            SELECT profile, count(*) AS n_users FROM p GROUP BY profile
        """,
        "doc_chain_ranks": """
            WITH w AS (
                SELECT doc_id, lang,
                       CASE WHEN doc_id - lag(doc_id) OVER (
                                PARTITION BY lang ORDER BY doc_id) <= 8
                            THEN 0 ELSE 1 END AS brk
                FROM documents
            ), i AS (
                SELECT doc_id, lang,
                       SUM(brk) OVER (PARTITION BY lang ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) AS isl
                FROM w
            )
            SELECT doc_id,
                   CAST(row_number() OVER (PARTITION BY lang, isl
                                           ORDER BY doc_id) - 1
                        AS BIGINT) AS hops,
                   min(doc_id) OVER (PARTITION BY lang, isl) AS root
            FROM i
        """,
        "event_value_winsorized": """
            WITH b AS (
                SELECT event_type,
                       percentile_cont(0.125) WITHIN GROUP (ORDER BY value) AS lo,
                       percentile_cont(0.875) WITHIN GROUP (ORDER BY value) AS hi
                FROM events GROUP BY event_type
            )
            SELECT e.event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(floor(
                       least(greatest(e.value, b.lo), b.hi) * 100 + 0.5
                   ) AS BIGINT)) AS BIGINT) AS wsum_cents
            FROM events e JOIN b USING (event_type)
            GROUP BY e.event_type
        """,
        "doc_chunk_windows": """
            WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text, ' \t\n\r'), '\\s+') AS toks
                FROM documents
                WHERE text IS NOT NULL AND length(trim(text, ' \t\n\r')) > 0
            ), c AS (
                SELECT doc_id, toks,
                       unnest(generate_series(1, len(toks), 24)) AS s
                FROM t
            )
            SELECT doc_id,
                   CAST((s - 1) // 24 AS BIGINT) AS chunk_idx,
                   CAST(least(s + 31, len(toks)) - s + 1 AS BIGINT) AS n_tok,
                   array_to_string(
                       list_slice(toks, s, least(s + 31, len(toks))), ' '
                   ) AS chunk_text
            FROM c
        """,
        "order_price_allocation": """
            WITH L AS (
                SELECT l_orderkey AS k, CAST(l_linenumber AS BIGINT) AS ln,
                       CAST(floor(l_extendedprice*100+0.5) AS BIGINT) AS w
                FROM lineitem
            ), O AS (
                SELECT o_orderkey AS k,
                       CAST(floor(o_totalprice*100+0.5) AS BIGINT) AS tot
                FROM orders
            ), J AS (
                SELECT L.k, L.ln, L.w, O.tot,
                       SUM(L.w) OVER (PARTITION BY L.k) AS tw
                FROM L JOIN O USING (k)
            ), B AS (
                SELECT k, ln, tot, (tot*w) // tw AS base, (tot*w) % tw AS frac
                FROM J
            ), R AS (
                SELECT k, ln, base,
                       row_number() OVER (PARTITION BY k
                                          ORDER BY frac DESC, ln) AS rn,
                       tot - SUM(base) OVER (PARTITION BY k) AS rem
                FROM B
            )
            SELECT k AS l_orderkey, ln AS l_linenumber,
                   CAST(base + CASE WHEN rn <= rem THEN 1 ELSE 0 END
                        AS BIGINT) AS alloc_cents
            FROM R
        """,
        "user_busy_intervals": """
            WITH iv AS (
                SELECT user_id, epoch_us(ts) AS s,
                       epoch_us(ts) + 300000000 AS e
                FROM events
            ), m AS (
                SELECT user_id, s, e,
                       CASE WHEN s <= max(e) OVER (
                                PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING)
                            THEN 0 ELSE 1 END AS ng
                FROM iv
            ), g AS (
                SELECT user_id, s, e,
                       SUM(ng) OVER (PARTITION BY user_id ORDER BY s, e
                                     ROWS UNBOUNDED PRECEDING) AS grp
                FROM m
            ), sp AS (
                SELECT user_id, grp, max(e) - min(s) AS span
                FROM g GROUP BY user_id, grp
            )
            SELECT user_id, count(*) AS n_busy,
                   CAST(sum(span) AS BIGINT) AS busy_us
            FROM sp GROUP BY user_id
        """,
        "event_transitions": """
            WITH s AS (
                SELECT user_id, event_type,
                       lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS prev_type
                FROM events
            )
            SELECT prev_type, event_type AS next_type, count(*) AS n
            FROM s WHERE prev_type IS NOT NULL
            GROUP BY prev_type, next_type
        """,
        "user_retention_daily": """
            WITH a AS (
                SELECT DISTINCT user_id,
                       epoch_us(ts) // 86400000000 AS active_day
                FROM events
            ), f AS (
                SELECT user_id, min(active_day) AS cohort_day
                FROM a GROUP BY user_id
            )
            SELECT cohort_day, active_day, count(*) AS n_users
            FROM a JOIN f USING (user_id)
            GROUP BY cohort_day, active_day
        """,
        "user_value_hourly_ffill": """
            WITH d AS (
                SELECT user_id, epoch_us(ts) AS t, max(value) AS v
                FROM events GROUP BY user_id, epoch_us(ts)
            ), b AS (
                SELECT user_id,
                       (min(t) + 3599999999) // 3600000000 AS lo,
                       max(t) // 3600000000 AS hi
                FROM d GROUP BY user_id
            ), grid AS (
                SELECT user_id, unnest(generate_series(lo, hi)) AS h
                FROM b WHERE lo <= hi
            ), pts AS (
                SELECT user_id, t AS ord, 0 AS is_grid, v,
                       CAST(NULL AS BIGINT) AS h
                FROM d
                UNION ALL
                SELECT user_id, h * 3600000000, 1, NULL, h FROM grid
            )
            SELECT user_id, h AS grid_hour,
                   last_value(v IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ord, is_grid
                       ROWS UNBOUNDED PRECEDING) AS value
            FROM pts QUALIFY is_grid = 1
        """,
        "name_typo_pairs": """
            SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
                   levenshtein(a.c_name, b.c_name) AS dist
            FROM customer a JOIN customer b
              ON a.c_custkey < b.c_custkey
            WHERE levenshtein(a.c_name, b.c_name) <= 1
        """,
        "order_skyline": """
            WITH pairs AS (
                SELECT DISTINCT o_totalprice, o_orderdate FROM orders
            ),
            s AS (
                SELECT o_totalprice, o_orderdate,
                       min(o_orderdate) OVER (
                           ORDER BY o_totalprice DESC, o_orderdate ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS prev
                FROM pairs
            )
            SELECT o_totalprice, o_orderdate FROM s
            WHERE prev IS NULL OR o_orderdate < prev
        """,
        "lang_chain_components": """
            WITH s AS (
                SELECT doc_id, lang,
                       lag(doc_id) OVER (
                           PARTITION BY lang ORDER BY doc_id) AS prev
                FROM documents
            ),
            m AS (
                SELECT doc_id, lang,
                       CASE WHEN prev IS NULL OR doc_id - prev > 8
                            THEN 1 ELSE 0 END AS brk
                FROM s
            ),
            g AS (
                SELECT doc_id, lang,
                       sum(brk) OVER (
                           PARTITION BY lang ORDER BY doc_id) AS grp
                FROM m
            )
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY lang, grp) AS component_id
            FROM g
        """,
        "user_top_event": """
            SELECT user_id, event_type AS top_type, value AS top_value,
                   event_id AS top_event_id
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id
                      ORDER BY value DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        "doc_dir_rollup": """
            WITH paths AS (
                SELECT source || '/' || lang || '/d'
                           || CAST(doc_id % 10 AS VARCHAR) AS path,
                       n_chars
                FROM documents
            ),
            pref AS (
                SELECT array_to_string(l[1:i], '/') AS prefix,
                       i AS depth, n_chars
                FROM (SELECT string_split(path, '/') AS l, n_chars,
                             unnest(range(1, 4)) AS i
                      FROM paths)
            )
            SELECT prefix, depth, count(*) AS n_files,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM pref GROUP BY 1, 2
        """,
        "top_collocations": """
            WITH toks AS (
                SELECT string_split(trim(text), ' ') AS l
                FROM documents WHERE length(trim(text)) > 0
            ),
            uni AS (
                SELECT u AS w, count(*) AS n
                FROM (SELECT unnest(l) AS u FROM toks) GROUP BY 1
            ),
            bi AS (
                SELECT l[i] AS w1, l[i+1] AS w2, count(*) AS n_xy
                FROM (SELECT l, unnest(range(1, len(l))) AS i FROM toks)
                GROUP BY 1, 2
            ),
            tot AS (
                SELECT (SELECT CAST(sum(n) AS BIGINT) FROM uni) AS n1,
                       (SELECT CAST(sum(n_xy) AS BIGINT) FROM bi) AS nb
            )
            SELECT w1, w2, n_xy, ux.n AS n_x, uy.n AS n_y,
                   ((CAST(n_xy AS DOUBLE) * CAST(n1 AS DOUBLE))
                        * CAST(n1 AS DOUBLE))
                     / ((CAST(nb AS DOUBLE) * CAST(ux.n AS DOUBLE))
                        * CAST(uy.n AS DOUBLE)) AS pmi_ratio
            FROM bi CROSS JOIN tot
            JOIN uni ux ON ux.w = bi.w1
            JOIN uni uy ON uy.w = bi.w2
            ORDER BY pmi_ratio DESC, w1, w2
            LIMIT 50
        """,
        "returnflag_weighted_median": """
            WITH w AS (
                SELECT l_returnflag AS g, l_extendedprice AS v,
                       CAST(l_quantity AS BIGINT) AS wt
                FROM lineitem
            ),
            agg AS (SELECT g, v, sum(wt) AS wv FROM w GROUP BY 1, 2),
            c AS (
                SELECT g, v,
                       sum(wv) OVER (PARTITION BY g ORDER BY v) AS cw,
                       sum(wv) OVER (PARTITION BY g) AS tot
                FROM agg
            )
            SELECT g AS l_returnflag,
                   CAST(max(tot) AS BIGINT) AS total_weight,
                   min(v) AS wmedian
            FROM c WHERE 2 * cw >= tot GROUP BY g
        """,
        "events_type_median_exact": """
            SELECT event_type,
                   count(*) AS n_events,
                   median(value) AS median_value
            FROM events GROUP BY event_type
        """,
        "source_ngram_overlap": """
            WITH toks AS (
                SELECT source, string_split(trim(text), ' ') AS tk
                FROM documents
            ),
            pos AS (
                SELECT source, tk, unnest(range(1, len(tk) - 2)) AS i
                FROM toks
            ),
            sh AS (
                SELECT DISTINCT source,
                       tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                             || ' ' || tk[i+3] AS g
                FROM pos
            ),
            sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
            inter AS (
                SELECT a.source AS sa, b.source AS sb, count(*) AS s
                FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
                GROUP BY 1, 2
            )
            SELECT i.sa AS src_a, i.sb AS src_b, i.s AS n_shared,
                   za.n AS n_a, zb.n AS n_b,
                   i.s * 1.0 / (za.n + zb.n - i.s) AS jacc
            FROM inter i
            JOIN sizes za ON za.source = i.sa
            JOIN sizes zb ON zb.source = i.sb
        """,
        "weighted_doc_sample": """
            SELECT doc_id, n_chars, rn FROM (
                SELECT doc_id, n_chars,
                       row_number() OVER (
                           ORDER BY ln(CAST((doc_id*48271) % 2147483647 + 1
                                            AS DOUBLE) / 2147483648.0)
                                    / n_chars DESC, doc_id
                       ) AS rn
                FROM documents
            ) WHERE rn <= 64
        """,
        "similar_doc_pairs": """
            WITH toks AS (
                SELECT doc_id, string_split(trim(text), ' ') AS tk
                FROM documents
            ),
            pos AS (
                SELECT doc_id, tk, unnest(range(1, len(tk) - 2)) AS i
                FROM toks
            ),
            sh AS (
                SELECT DISTINCT doc_id,
                       tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                             || ' ' || tk[i+3] AS g
                FROM pos
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS s
                FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT i.da AS doc_a, i.db AS doc_b, i.s AS n_shared,
                   sa.n AS n_a, sb.n AS n_b,
                   i.s * 1.0 / (sa.n + sb.n - i.s) AS jacc
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.da
            JOIN sizes sb ON sb.doc_id = i.db
            WHERE 21 * i.s >= sa.n + sb.n
        """,
        "similar_docs_topk": """
            WITH toks AS (
                SELECT doc_id, string_split(trim(text), ' ') AS tk
                FROM documents
            ),
            pos AS (
                SELECT doc_id, tk, unnest(range(1, len(tk) - 2)) AS i
                FROM toks
            ),
            sh AS (
                SELECT DISTINCT doc_id,
                       tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                             || ' ' || tk[i+3] AS g
                FROM pos
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS s
                FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id <> b.doc_id
                GROUP BY 1, 2
            ),
            scored AS (
                SELECT i.da AS src_id, i.db AS nbr_id, i.s AS n_shared,
                       i.s * 1.0 / (sa.n + sb.n - i.s) AS jacc
                FROM inter i
                JOIN sizes sa ON sa.doc_id = i.da
                JOIN sizes sb ON sb.doc_id = i.db
                WHERE 21 * i.s >= sa.n + sb.n
            ),
            ranked AS (
                SELECT *, row_number() OVER (
                    PARTITION BY src_id ORDER BY jacc DESC, nbr_id
                ) AS rank
                FROM scored
            )
            SELECT src_id, nbr_id, n_shared, jacc, rank
            FROM ranked WHERE rank <= 3
        """,
        "eval_overlap_pairs": """
            WITH toks AS (
                SELECT doc_id, string_split(trim(text), ' ') AS tk
                FROM documents
            ),
            pos AS (
                SELECT doc_id, tk, unnest(range(1, len(tk) - 2)) AS i
                FROM toks
            ),
            sh AS (
                SELECT DISTINCT doc_id,
                       tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                             || ' ' || tk[i+3] AS g
                FROM pos
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            ev AS (
                SELECT * FROM sh
                WHERE (doc_id * 2654435761) % 4294967296 < 1288490188
            ),
            tr AS (
                SELECT * FROM sh
                WHERE (doc_id * 2654435761) % 4294967296 >= 1288490188
            ),
            inter AS (
                SELECT e.doc_id AS ea, t.doc_id AS tb, count(*) AS s
                FROM ev e JOIN tr t ON e.g = t.g
                GROUP BY 1, 2
            )
            SELECT i.ea AS eval_id, i.tb AS train_id, i.s AS n_shared,
                   sa.n AS n_a, sb.n AS n_b,
                   i.s * 1.0 / (sa.n + sb.n - i.s) AS jacc
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.ea
            JOIN sizes sb ON sb.doc_id = i.tb
            WHERE 21 * i.s >= sa.n + sb.n
        """,
        "scrub_boilerplate_tokens": """
            WITH t AS (
                SELECT doc_id, string_split(trim(text), ' ') AS tk
                FROM documents
            ),
            total AS (SELECT count(*) AS n_docs FROM documents),
            pos AS (
                SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i
                FROM t
            ),
            df AS (
                SELECT tok, count(DISTINCT doc_id) AS dfc
                FROM (SELECT doc_id, tk[i] AS tok FROM pos)
                GROUP BY tok
            ),
            stop AS (SELECT tok FROM df, total WHERE 2 * dfc >= n_docs),
            kept AS (
                SELECT p.doc_id, tk[i] AS tok, i FROM pos p
                WHERE tk[i] NOT IN (SELECT tok FROM stop)
            ),
            agg AS (
                SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text,
                       count(*) AS n_kept
                FROM kept GROUP BY doc_id
            )
            SELECT t.doc_id, COALESCE(a.clean_text, '') AS clean_text,
                   len(t.tk) - COALESCE(a.n_kept, 0) AS n_removed
            FROM t LEFT JOIN agg a USING (doc_id)
        """,
        "pack_sequences": """
            WITH n AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE length(regexp_split_to_array(trim(text), '\\s+'))
                       END AS n_tokens
                FROM documents
            ),
            c AS (
                SELECT doc_id, n_tokens,
                       COALESCE(SUM(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS start_tok
                FROM n
            )
            SELECT doc_id, n_tokens, CAST(start_tok AS BIGINT) AS start_tok,
                   CAST(start_tok // 512 AS BIGINT) AS seq_bin
            FROM c
        """,
        "events_zorder": f"""
            WITH e AS (
                SELECT event_id, user_id & 65535 AS x,
                       CAST(floor(value * 1000.0) AS BIGINT) & 65535 AS y
                FROM events
            )
            SELECT event_id, {_zexpr} AS zkey, {_zexpr} >> 26 AS tile
            FROM e
        """,
        "exact_dedup": """
            SELECT md5(text) AS content_md5, count(*) AS n_copies,
                   min(doc_id) AS keep_id
            FROM documents GROUP BY 1
        """,
        "canonicalize_basic": """
            SELECT doc_id,
                   md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS canon_md5,
                   length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS canon_len
            FROM documents
        """,
        "token_count": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE length(regexp_split_to_array(trim(text), '\\s+'))
                   END AS n_tokens
            FROM documents
        """,
        "quality_stats": """
            SELECT d.doc_id,
                   length(d.text) AS n_chars,
                   w.n_words, w.n_distinct_words, w.max_word_len,
                   length(regexp_replace(d.text, '[^A-Za-z]', '', 'g')) AS alpha_chars,
                   length(regexp_replace(d.text, '[^0-9]', '', 'g')) AS digit_chars,
                   length(d.text) - length(replace(d.text, ' ', '')) AS space_chars
            FROM documents d
            JOIN (
                SELECT doc_id, count(w) AS n_words,
                       count(DISTINCT w) AS n_distinct_words,
                       max(length(w)) AS max_word_len
                FROM (SELECT doc_id,
                             unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
                      FROM documents)
                GROUP BY doc_id
            ) w USING (doc_id)
        """,
        "lang_count": """
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        """,
        "ngram_shingles": """
            SELECT doc_id, count(DISTINCT substr(text, i, 5)) AS n_shingles
            FROM (SELECT doc_id, text,
                         unnest(range(1, greatest(length(text) - 4, 0) + 1)) AS i
                  FROM documents)
            WHERE length(text) >= 5
            GROUP BY doc_id
        """,
        "word_jaccard_pairs": """
            WITH toks AS (
                SELECT doc_id, list(DISTINCT w) AS ws
                FROM (SELECT doc_id,
                             unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
                      FROM documents)
                GROUP BY doc_id
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(CAST(length(list_intersect(a.ws, b.ws)) AS DOUBLE) /
                         CAST(length(a.ws) + length(b.ws)
                              - length(list_intersect(a.ws, b.ws)) AS DOUBLE),
                         6) AS jaccard
            FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1
        """,
        "quality_filter": """
            WITH w AS (
                SELECT doc_id, count(w) AS n_words,
                       count(DISTINCT w) AS n_distinct_words
                FROM (SELECT doc_id,
                             unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
                      FROM documents)
                GROUP BY doc_id
            ),
            d AS (
                SELECT doc_id, length(text) AS n_chars,
                       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars
                FROM documents
            )
            SELECT doc_id, n_words, n_distinct_words, alpha_chars
            FROM w JOIN d USING (doc_id)
            WHERE n_words BETWEEN 20 AND 80
              AND n_distinct_words * 10 >= n_words * 4
              AND alpha_chars * 100 >= n_chars * 82
        """,
        "boilerplate_ngrams": """
            WITH toks AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
                FROM documents
            ),
            grams AS (
                SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS gram
                FROM (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS i
                      FROM toks)
            )
            SELECT gram, count(*) AS n_docs
            FROM grams GROUP BY gram HAVING count(*) >= 3
        """,
        "doc_token_positions": """
            SELECT doc_id,
                   unnest(range(1, len(regexp_split_to_array(trim(text), '\\s+')) + 1)) AS pos,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
            FROM documents
        """,
        "edit_distance_pairs": """
            WITH pfx AS (
                SELECT doc_id, substr(text, 1, 120) AS p FROM documents
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(levenshtein(a.p, b.p) AS BIGINT) AS lev,
                   jaccard(a.p, b.p) AS char_jacc
            FROM pfx a JOIN pfx b ON b.doc_id = a.doc_id + 1
        """,
        "user_event_pivot": """
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                   CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
                   CAST(sum(CASE WHEN event_type = 'click' THEN CAST(floor(value * 1000.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS milli_click,
                   CAST(sum(CASE WHEN event_type = 'error' THEN CAST(floor(value * 1000.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS milli_error,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(floor(value * 1000.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS milli_purchase,
                   CAST(sum(CASE WHEN event_type = 'signup' THEN CAST(floor(value * 1000.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS milli_signup,
                   CAST(sum(CASE WHEN event_type = 'view' THEN CAST(floor(value * 1000.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS milli_view
            FROM events GROUP BY user_id
        """,
        "users_with_both": """
            SELECT user_id FROM events
            WHERE event_type = 'purchase' AND value >= 95.0
            INTERSECT
            SELECT user_id FROM events
            WHERE event_type = 'error' AND value >= 95.0
        """,
        "users_without": """
            SELECT user_id FROM events
            WHERE event_type = 'purchase' AND value >= 95.0
            EXCEPT
            SELECT user_id FROM events
            WHERE event_type = 'error' AND value >= 95.0
        """,
        "event_value_histogram": """
            SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
                   count(*) AS n
            FROM events GROUP BY 1
        """,
        "orders_by_month": """
            SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
                   CAST(month(o_orderdate) AS BIGINT) AS month,
                   count(*) AS n,
                   CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS price_cents
            FROM orders GROUP BY 1, 2
        """,
        "props_key_stats": """
            SELECT event_type, count(*) AS n,
                   CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                   CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
            FROM events GROUP BY event_type
        """,
        "redact_docs": """
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                         'https?://[^\\s]+', '<URL>', 'g'),
                       '[0-9]{3,}', '<NUM>', 'g'),
                     '\\b(spark|window)\\b', '<MASK>', 'g') AS redacted,
                   CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                      + len(regexp_extract_all(text, 'https?://[^\\s]+'))
                      + len(regexp_extract_all(text, '[0-9]{3,}'))
                      + len(regexp_extract_all(text, '\\b(spark|window)\\b')) AS BIGINT) AS n_masked
            FROM documents
        """,
        "customer_order_ranks": """
            SELECT o_custkey, o_orderkey,
                   row_number() OVER w AS rn,
                   rank() OVER (PARTITION BY o_custkey
                                ORDER BY CAST(floor(o_totalprice * 100.0) AS BIGINT) DESC
                               ) AS price_rank,
                   dense_rank() OVER (PARTITION BY o_custkey
                                ORDER BY CAST(floor(o_totalprice * 100.0) AS BIGINT) DESC
                               ) AS price_dense_rank,
                   ntile(4) OVER w AS date_ntile,
                   coalesce(lag(CAST(floor(o_totalprice * 100.0) AS BIGINT)) OVER w,
                            -1) AS prev_price_cents,
                   percent_rank() OVER (PARTITION BY o_custkey
                                ORDER BY CAST(floor(o_totalprice * 100.0) AS BIGINT) DESC
                               ) AS price_pct_rank,
                   cume_dist() OVER (PARTITION BY o_custkey
                                ORDER BY CAST(floor(o_totalprice * 100.0) AS BIGINT) DESC
                               ) AS price_cume_dist,
                   CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT))
                        OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_price_cents
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
        "customer_order_frames": """
            WITH o AS (
                SELECT o_custkey, o_orderkey, o_orderdate,
                       CAST(floor(o_totalprice * 100.0) AS BIGINT) AS price_cents
                FROM orders
            )
            SELECT o_custkey, o_orderkey,
                   CAST(sum(price_cents) OVER (
                        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov_sum3,
                   CAST(sum(price_cents) OVER (
                        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                     / (count(*) OVER (
                        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS mov_avg3,
                   first_value(price_cents) OVER w AS first_price,
                   last_value(price_cents) OVER (
                        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                   ) AS last_price,
                   coalesce(lead(price_cents) OVER w, -1) AS next_price,
                   coalesce(nth_value(price_cents, 2) OVER (
                        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                   ), -1) AS second_price
            FROM o
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
        "lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                   CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "lineitem_q1_full": """
            WITH l AS (
                SELECT l_returnflag, l_linestatus,
                       CAST(floor(l_quantity) AS BIGINT) AS qty,
                       CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS base_c,
                       CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0)
                            AS BIGINT) AS disc_c,
                       CAST(floor(l_extendedprice * (1.0 - l_discount)
                                  * (1.0 + l_tax) * 100.0) AS BIGINT) AS charge_c,
                       CAST(floor(l_discount * 10000.0) AS BIGINT) AS disc_bp
                FROM lineitem
            )
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(qty) AS BIGINT) AS sum_qty,
                   CAST(sum(base_c) AS BIGINT) AS sum_base_cents,
                   CAST(sum(disc_c) AS BIGINT) AS sum_disc_cents,
                   CAST(sum(charge_c) AS BIGINT) AS sum_charge_cents,
                   CAST(sum(disc_bp) AS BIGINT) AS sum_disc_bp,
                   count(*) AS n,
                   CAST(CAST(sum(qty) AS BIGINT) AS DOUBLE) / count(*)
                       AS avg_qty,
                   CAST(CAST(sum(base_c) AS BIGINT) AS DOUBLE) / count(*)
                       AS avg_price_cents,
                   CAST(CAST(sum(disc_bp) AS BIGINT) AS DOUBLE) / count(*)
                       AS avg_disc_bp
            FROM l GROUP BY l_returnflag, l_linestatus
        """,
        "events_hourly": """
            SELECT event_type,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
                   count(*) AS n,
                   CAST(sum(CAST(floor(value * 1000.0) AS BIGINT)) AS BIGINT) AS sum_value_milli
            FROM events GROUP BY 1, 2
        """,
        "top_events_by_value": """
            SELECT event_id,
                   CAST(floor(value * 1000.0) AS BIGINT) AS value_milli
            FROM events
            ORDER BY value_milli DESC, event_id
            LIMIT 20
        """,
        "embedding_dups": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 4) AS cos_sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.3
        """,
        "distinct_users": """
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "mktsegment_order_stats": """
            SELECT c.c_mktsegment,
                   CAST(sum(CAST(floor(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
                       AS total_cents,
                   count(*) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "supplier_nation_agg": """
            SELECT n.n_name,
                   CAST(sum(CAST(floor(s.s_acctbal * 100.0) AS BIGINT)) AS BIGINT)
                       AS acctbal_cents,
                   count(*) AS n_suppliers
            FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "bpe_token_count": """
            SELECT doc_id,
                   CAST(length(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tokens
            FROM documents
        """,
        "exact_copy_coclustering": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text
                FROM documents WHERE doc_id % 50 = 0
            )
            SELECT md5(text) AS content_md5, count(*) AS n_copies,
                   min(doc_id) AS keep_id, CAST(1 AS BIGINT) AS n_clusters
            FROM corpus GROUP BY 1 HAVING count(*) > 1 ORDER BY 1
        """,
        "lineitem_rollup": """
            SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   count(*) AS n
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "orders_cube": """
            SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
                   coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
                   CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS price_cents,
                   count(*) AS n
            FROM orders
            GROUP BY CUBE(o_orderstatus, o_orderpriority)
        """,
        "repetition_stats": """
            WITH lines AS (
                SELECT doc_id, unnest(string_split(text, chr(10))) AS line
                FROM documents
            ),
            lc AS (
                SELECT doc_id, line, count(*) AS c
                FROM lines GROUP BY doc_id, line
            ),
            per AS (
                SELECT doc_id,
                       CAST(sum(c) AS BIGINT) AS n_lines,
                       count(*) AS n_distinct_lines,
                       CAST(max(c) AS BIGINT) AS top_line_count,
                       CAST(coalesce(sum(CASE WHEN c > 1
                                              THEN c * length(line) END), 0)
                            AS BIGINT) AS dup_line_chars
                FROM lc GROUP BY doc_id
            ),
            wc AS (
                SELECT doc_id, w, count(*) AS c
                FROM (SELECT doc_id,
                             unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
                      FROM documents WHERE trim(text) <> '')
                GROUP BY doc_id, w
            ),
            wtop AS (
                SELECT doc_id, CAST(max(c) AS BIGINT) AS top_word_count
                FROM wc GROUP BY doc_id
            )
            SELECT per.doc_id, n_lines, n_distinct_lines, top_line_count,
                   dup_line_chars,
                   coalesce(wtop.top_word_count, 0) AS top_word_count
            FROM per LEFT JOIN wtop USING (doc_id)
        """,
        "user_sessions": """
            WITH e AS (SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS ms FROM events),
            g AS (SELECT user_id, ms,
                    CASE WHEN lag(ms) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
                         OR ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms) > 1800000
                         THEN 1 ELSE 0 END AS brk
                  FROM e),
            s AS (SELECT user_id, ms,
                    sum(brk) OVER (PARTITION BY user_id ORDER BY ms
                                   ROWS UNBOUNDED PRECEDING) AS session_id
                  FROM g)
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   count(*) AS n_events, min(ms) AS start_ms, max(ms) AS end_ms
            FROM s GROUP BY user_id, session_id
        """,
        "event_order_asof": """
            WITH o AS (
                SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
                FROM orders GROUP BY 1, 2
            )
            SELECT e.event_id, e.user_id,
                   CAST(epoch_ms(e.ts) AS BIGINT) AS event_ms,
                   o.o_orderkey,
                   CAST(epoch_ms(o.o_orderdate) AS BIGINT) AS order_ms
            FROM events e ASOF JOIN o
              ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        """,
        "click_attribution": """
            SELECT e1.event_id, e1.user_id, count(*) AS n_purchases,
                   min(CAST(epoch_ms(e2.ts) AS BIGINT)) AS first_purchase_ms
            FROM events e1 JOIN events e2
              ON e1.user_id = e2.user_id
             AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 6 HOUR
            WHERE e1.event_type = 'click' AND e2.event_type = 'purchase'
            GROUP BY 1, 2
        """,
        "events_sliding": """
            WITH e AS (SELECT CAST(epoch_ms(ts) AS BIGINT) // 900000 AS bkt,
                              CAST(floor(value * 100.0) AS BIGINT) AS cents
                       FROM events),
            k AS (SELECT unnest([0, 1, 2, 3]) AS j)
            SELECT (e.bkt - k.j) * 900000 AS window_start_ms,
                   count(*) AS n_events,
                   CAST(sum(e.cents) AS BIGINT) AS sum_value_cents
            FROM e CROSS JOIN k GROUP BY 1
        """,
        "tfidf_top_terms": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
                FROM documents
            ),
            t AS (SELECT doc_id, term, count(*) AS tf
                  FROM toks WHERE term <> '' GROUP BY 1, 2),
            d AS (SELECT term, count(*) AS df FROM t GROUP BY 1),
            s AS (SELECT t.doc_id, t.term, t.tf, d.df,
                         t.tf * ln(((SELECT count(*) FROM documents) + 1.0)
                                   / (d.df + 1.0)) AS score
                  FROM t JOIN d USING (term))
            SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
                   CAST(df AS BIGINT) AS df
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn
                  FROM s)
            WHERE rn <= 5
        """,
        "hash_sample": """
            SELECT doc_id, lang FROM documents
            WHERE (doc_id * 2654435761) % 4294967296 < 429496729
        """,
        "lang_top_docs": """
            SELECT lang, doc_id, n_chars
            FROM (SELECT lang, doc_id, n_chars, row_number() OVER (
                      PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
                  FROM documents)
            WHERE rn <= 3
        """,
        "order_customer_nation": """
            SELECT n.n_name,
                   CAST(sum(CAST(floor(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
                       AS total_cents,
                   count(*) AS n_orders
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
            )
        """,
        "all_party_names": """
            SELECT c_name AS name FROM customer
            UNION
            SELECT s_name AS name FROM supplier
        """,
        "customers_with_big_order": """
            SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice >= 450000.0
            )
        """,
        "nation_customer_names": """
            SELECT c_nationkey, count(*) AS n_customers,
                   string_agg(c_name, ',' ORDER BY c_name) AS names
            FROM customer GROUP BY c_nationkey
        """,
        "customers_without_orders_bloom": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
            )
        """,
        "priority_price_quantiles": """
            SELECT o_orderpriority,
                   quantile_disc(cents, 0.5) AS p50_cents,
                   quantile_disc(cents, 0.9) AS p90_cents,
                   count(*) AS n_orders
            FROM (SELECT o_orderpriority,
                         CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents
                  FROM orders)
            GROUP BY o_orderpriority
        """,
        "ann_topk": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[], qe::DOUBLE[]), 4) AS cos_sim
            FROM embeddings, q
            ORDER BY round(list_cosine_similarity(embedding::DOUBLE[], qe::DOUBLE[]), 4) DESC,
                     vec_id
            LIMIT 10
        """,
        "contamination_flags": """
            WITH phrases AS (
                SELECT DISTINCT substr(text, 1, 40) AS phrase FROM documents
                WHERE doc_id % 97 = 0 AND length(text) >= 40
            )
            SELECT doc_id, n_hits FROM (
                SELECT d.doc_id,
                       CAST((SELECT count(*) FROM phrases p
                             WHERE contains(d.text, p.phrase)) AS BIGINT) AS n_hits
                FROM documents d
            ) WHERE n_hits >= 1
        """,
        "contamination_ngram": """
            WITH phrases AS (
                SELECT DISTINCT substr(text, 1, 40) AS phrase FROM documents
                WHERE doc_id % 97 = 0 AND length(text) >= 40
            )
            SELECT doc_id, n_hits FROM (
                SELECT d.doc_id,
                       CAST((SELECT count(*) FROM phrases p
                             WHERE contains(d.text, p.phrase)) AS BIGINT) AS n_hits
                FROM documents d
            ) WHERE n_hits >= 1
        """,
        "stratified_sample": """
            SELECT lang, doc_id, rn FROM (
                SELECT lang, doc_id,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY (doc_id * 48271) % 2147483647, doc_id
                       ) AS rn
                FROM documents
            ) WHERE rn <= 25
        """,
        "lineitem_unpivot": """
            SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
                   CAST(floor(l_quantity * 1000.0) AS BIGINT) AS milli
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'extendedprice',
                   CAST(floor(l_extendedprice * 1000.0) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'discount',
                   CAST(floor(l_discount * 1000.0) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'tax',
                   CAST(floor(l_tax * 1000.0) AS BIGINT)
            FROM lineitem
        """,
        "orders_above_customer_avg": """
            WITH a AS (
                SELECT o_custkey, count(*) AS n,
                       SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS s
                FROM orders GROUP BY o_custkey
            )
            SELECT o.o_orderkey, o.o_custkey,
                   CAST(floor(o.o_totalprice * 100.0) AS BIGINT) AS price_cents
            FROM orders o JOIN a USING (o_custkey)
            WHERE CAST(floor(o.o_totalprice * 100.0) AS BIGINT) * a.n > a.s
        """,
        "tpch_q5_local_revenue": """
            SELECT n_name,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                       * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
            FROM region, nation, customer, orders, lineitem, supplier
            WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
              AND c_nationkey = n_nationkey AND o_custkey = c_custkey
              AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
              AND s_nationkey = c_nationkey
              AND o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
            GROUP BY n_name
        """,
        "export_training_shards": """
            SELECT ((doc_id * 2654435761) % 4294967296) % 8 AS shard,
                   count(*) AS n_docs,
                   CAST(sum(doc_id % 1099511627776) % 1099511627776
                        AS BIGINT) AS id_check
            FROM documents GROUP BY 1
        """,
        "doc_rarity_score": """
            WITH tok AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS t
                FROM documents
            ), tf AS (
                SELECT doc_id, t, count(*) AS c FROM tok
                WHERE t <> '' GROUP BY doc_id, t
            ), tot AS (
                SELECT t, CAST(sum(c) AS BIGINT) AS total FROM tf GROUP BY t
            )
            SELECT tf.doc_id,
                   CAST(sum(tf.c) AS BIGINT) AS n_tokens,
                   CAST(sum(tf.c * tot.total) AS BIGINT) AS freq_sum
            FROM tf JOIN tot USING (t)
            GROUP BY tf.doc_id
        """,
        "label_centroids": """
            WITH ex AS (
                SELECT label, unnest(embedding) AS v,
                       unnest(range(1, len(embedding) + 1)) AS dim
                FROM embeddings
            )
            SELECT CAST(label AS BIGINT) AS label, dim,
                   CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000.0)
                                 AS BIGINT)) AS BIGINT)
                       AS sum_micro,
                   count(*) AS n
            FROM ex GROUP BY 1, 2
        """,
    "user_funnel": """
            WITH e AS (
                SELECT user_id, event_type,
                       CAST(epoch_us(ts) AS BIGINT) AS t
                FROM events
                WHERE event_type IN ('view', 'click', 'purchase')
            ), u AS (
                SELECT DISTINCT user_id FROM e
            ), v AS (
                SELECT user_id, min(t) AS t FROM e
                WHERE event_type = 'view' GROUP BY 1
            ), c AS (
                SELECT e.user_id, min(e.t) AS t
                FROM e JOIN v USING (user_id)
                WHERE e.event_type = 'click' AND e.t > v.t
                GROUP BY e.user_id
            ), p AS (
                SELECT e.user_id, min(e.t) AS t
                FROM e JOIN c USING (user_id)
                WHERE e.event_type = 'purchase' AND e.t > c.t
                GROUP BY e.user_id
            )
            SELECT u.user_id,
                   CASE WHEN p.t IS NOT NULL THEN 3
                        WHEN c.t IS NOT NULL THEN 2
                        WHEN v.t IS NOT NULL THEN 1 ELSE 0 END AS stage_reached,
                   coalesce(v.t, -1) AS view_ts_us,
                   coalesce(c.t, -1) AS click_ts_us,
                   coalesce(p.t, -1) AS purchase_ts_us
            FROM u
            LEFT JOIN v USING (user_id)
            LEFT JOIN c USING (user_id)
            LEFT JOIN p USING (user_id)
        """,
    "documents_upsert": """
            SELECT doc_id, text, lang, source
            FROM documents WHERE doc_id % 10 <> 0
            UNION ALL
            SELECT doc_id, upper(text) AS text, lang, source
            FROM documents WHERE doc_id % 10 = 0
        """,
    "brand_type_margin": """
            SELECT p_brand, p_type, count(*) AS n_items,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                       * 100) AS BIGINT)) AS BIGINT)
                       AS sold_cents,
                   CAST(SUM(CAST(FLOOR(l_quantity * p_retailprice * 100)
                                 AS BIGINT)) AS BIGINT) AS catalog_cents
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand, p_type
        """,
    "event_debounce": """
            WITH w AS (
                SELECT event_id, user_id, event_type,
                       CAST(epoch_us(ts) AS BIGINT) AS t,
                       lag(CAST(epoch_us(ts) AS BIGINT)) OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id
                       ) AS prev_t
                FROM events
            )
            SELECT event_id, user_id, event_type, t AS ts_us
            FROM w WHERE prev_t IS NULL OR t - prev_t > 300000000
        """,
    "events_value_p99_outliers": """
            SELECT event_id,
                   CAST(floor(value * 1000.0) AS BIGINT) AS value_milli
            FROM events
            WHERE value > (SELECT quantile_disc(value, 0.99) FROM events)
        """,
    "events_value_mad": """
            WITH m AS (SELECT quantile_disc(value, 0.5) AS med FROM events)
            SELECT CAST(floor(m.med * 1000.0) AS BIGINT) AS median_milli,
                   CAST(floor(
                       (SELECT quantile_disc(abs(value - m.med), 0.5)
                        FROM events) * 1000.0
                   ) AS BIGINT) AS mad_milli
            FROM m
        """,
    "embedding_quantize_int8": """
            WITH ex AS (
                SELECT vec_id,
                       unnest(embedding) AS v,
                       unnest(range(1, len(embedding) + 1)) AS dim,
                       list_max(list_transform(
                           embedding, x -> abs(CAST(x AS DOUBLE))
                       )) AS scale
                FROM embeddings
            )
            SELECT vec_id, dim,
                   CAST(floor(CAST(v AS DOUBLE) / scale * 127.0) AS BIGINT)
                       AS qval,
                   CAST(floor(scale * 1000000.0) AS BIGINT) AS scale_micro
            FROM ex WHERE scale > 0
        """,
    "user_order_full_outer": """
            WITH l AS (
                SELECT user_id AS k, count(*) AS n_purchases FROM events
                WHERE event_type = 'purchase' GROUP BY 1
            ), r AS (
                SELECT o_custkey AS k, count(*) AS n_f_orders FROM orders
                WHERE o_orderstatus = 'F' GROUP BY 1
            )
            SELECT coalesce(l.k, r.k) AS k,
                   coalesce(l.n_purchases, -1) AS n_purchases,
                   coalesce(r.n_f_orders, -1) AS n_f_orders
            FROM l FULL OUTER JOIN r ON l.k = r.k
        """,
    "global_event_ranks": """
            SELECT event_id,
                   CAST(floor(value * 1000.0) AS BIGINT) AS value_milli,
                   row_number() OVER (ORDER BY value DESC, event_id)
                       AS global_rank
            FROM events
        """,
    "user_event_diversity": """
            WITH c AS (SELECT user_id, event_type, count(*) AS n
                       FROM events GROUP BY 1, 2)
            SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
                   CAST(sum(n)*sum(n) - sum(n*n) AS DOUBLE)
                       / CAST(sum(n)*sum(n) AS DOUBLE) AS diversity
            FROM c GROUP BY 1
        """,
    "tpch_q3_top_orders": """
            SELECT l_orderkey,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                       * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents,
                   o_orderdate
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue_cents DESC, l_orderkey LIMIT 10
        """,
    "tpch_q13_custdist": """
            SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM (SELECT c.c_custkey,
                         CAST(count(o.o_orderkey) AS BIGINT) AS c_count
                  FROM customer c LEFT JOIN orders o
                       ON c.c_custkey = o.o_custkey
                  GROUP BY c.c_custkey)
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
    "tpch_q4_late_shipments": """
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate >
                                o.o_orderdate + INTERVAL 45 DAY)
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
    "user_longest_streak": """
            WITH days AS (
                SELECT DISTINCT user_id,
                       date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                           AS d
                FROM events),
            r AS (SELECT user_id, d,
                         d - row_number() OVER (PARTITION BY user_id
                                                ORDER BY d) AS grp
                  FROM days),
            il AS (SELECT user_id, CAST(count(*) AS BIGINT) AS len
                   FROM r GROUP BY user_id, grp)
            SELECT user_id, max(len) AS longest_streak
            FROM il GROUP BY user_id
        """,
    "user_interevent_median": """
            WITH g AS (
                SELECT user_id,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id)
                           AS gap
                FROM events)
            SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps,
                   percentile_cont(0.5) WITHIN GROUP (ORDER BY gap)
                       AS median_gap_us
            FROM g WHERE gap IS NOT NULL GROUP BY user_id
        """,
    "event_value_deciles": """
            WITH c AS (SELECT CAST(floor(CAST(value AS DOUBLE) * 100)
                              AS BIGINT) AS vc FROM events),
            t AS (SELECT quantile_cont(CAST(vc AS DOUBLE),
                         [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
                         AS th FROM c)
            SELECT CAST(len(list_filter(t.th,
                            x -> x < CAST(c.vc AS DOUBLE))) AS BIGINT)
                       AS decile,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(c.vc) AS BIGINT) AS sum_cents
            FROM c, t GROUP BY 1
        """,
    "tpch_q8_market_share": """
            WITH j AS (
                SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                       CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                  * 100) AS BIGINT) AS cents,
                       n2.n_name AS supp_nation
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
                JOIN region r ON n1.n_regionkey = r.r_regionkey
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
                WHERE r.r_name = 'ASIA')
            SELECT o_year,
                   CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                                 THEN cents ELSE 0 END) AS BIGINT)
                       AS nation_cents,
                   CAST(sum(cents) AS BIGINT) AS total_cents,
                   CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                                      THEN cents ELSE 0 END) AS BIGINT)
                        AS DOUBLE)
                       / CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)
                       AS share
            FROM j GROUP BY 1
        """,
    "tpch_q21_waiting_suppliers": """
            WITH l AS (SELECT l_orderkey, l_suppkey, l_shipdate
                       FROM lineitem),
            o AS (SELECT o_orderkey, o_orderdate FROM orders)
            SELECT s.s_suppkey, s.s_name,
                   CAST(count(DISTINCT l1.l_orderkey) AS BIGINT)
                       AS n_orders
            FROM l l1 JOIN o ON l1.l_orderkey = o.o_orderkey
            JOIN supplier s ON l1.l_suppkey = s.s_suppkey
            WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
              AND EXISTS (SELECT 1 FROM l l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (
                  SELECT 1 FROM l l3
                  JOIN o o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 45 DAY)
            GROUP BY 1, 2 ORDER BY n_orders DESC, s_suppkey LIMIT 10
        """,
    "tpch_q7_nation_volume": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   CAST(sum(CAST(floor(l.l_extendedprice
                                       * (1 - l.l_discount) * 100)
                                 AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE n1.n_nationkey <> n2.n_nationkey
              AND l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3
        """,
    "tpch_q15_top_supplier": """
            WITH r AS (SELECT l_suppkey,
                              CAST(sum(CAST(floor(l_extendedprice
                                   * (1 - l_discount) * 100) AS BIGINT))
                                   AS BIGINT) AS total_cents
                       FROM lineitem
                       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                         AND l_shipdate < TIMESTAMP '1996-04-01'
                       GROUP BY 1)
            SELECT s.s_suppkey, s.s_name, r.total_cents
            FROM supplier s JOIN r ON s.s_suppkey = r.l_suppkey
            WHERE r.total_cents = (SELECT max(total_cents) FROM r)
            ORDER BY s.s_suppkey
        """,
    "tpch_q17_small_quantity_revenue": """
            WITH a AS (SELECT l_partkey,
                              0.2 * (CAST(CAST(sum(CAST(floor(l_quantity)
                                        AS BIGINT)) AS BIGINT) AS DOUBLE)
                                     / CAST(CAST(count(*) AS BIGINT)
                                            AS DOUBLE)) AS lim
                       FROM lineitem GROUP BY 1)
            SELECT CAST(sum(CAST(floor(l.l_extendedprice * 100)
                                 AS BIGINT)) AS BIGINT) AS total_cents,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem l JOIN a ON l.l_partkey = a.l_partkey
            WHERE l.l_quantity < a.lim
        """,
    "tpch_q19_bracket_revenue": """
            SELECT CAST(sum(CAST(floor(l.l_extendedprice
                                       * (1 - l.l_discount) * 100)
                                 AS BIGINT)) AS BIGINT) AS revenue_cents,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 10
                   AND l.l_quantity BETWEEN 1 AND 11)
               OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 15
                   AND l.l_quantity BETWEEN 10 AND 20)
               OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 25
                   AND l.l_quantity BETWEEN 20 AND 30)
        """,
    "lineitem_rate_grid": """
            SELECT CAST(floor(CAST(l_tax AS DOUBLE) * 100) AS BIGINT)
                       AS tax_pct,
                   CAST(floor(CAST(l_discount AS DOUBLE) * 100)
                        AS BIGINT) AS disc_pct,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS rev_cents
            FROM lineitem GROUP BY 1, 2
        """,
    "orders_weekday_seasonality": """
            WITH w AS (SELECT isodow(o_orderdate) AS wd FROM orders),
            t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM w)
            SELECT CAST(w.wd AS BIGINT) AS weekday,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(CAST(count(*) AS BIGINT) AS DOUBLE)
                       / CAST(t.tot AS DOUBLE) AS share
            FROM w, t GROUP BY 1, t.tot
        """,
    "stratified_fixed_k_sample": """
            WITH n AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl
                       FROM documents GROUP BY 1),
            t AS (SELECT CAST(sum(nl) AS BIGINT) AS tot FROM n),
            q AS (SELECT n.lang, n.nl, (100 * n.nl) // t.tot AS base,
                         (100 * n.nl) % t.tot AS rem
                  FROM n, t),
            q2 AS (SELECT lang, base, rem,
                          row_number() OVER (ORDER BY rem DESC, lang)
                              AS rr
                   FROM q),
            lo AS (SELECT CAST(100 - sum(base) AS BIGINT) AS k FROM q2),
            quota AS (SELECT q2.lang,
                             CAST(q2.base + CASE WHEN q2.rr <= lo.k
                                  THEN 1 ELSE 0 END AS BIGINT) AS qq
                      FROM q2, lo),
            r AS (SELECT lang, doc_id,
                         row_number() OVER (
                             PARTITION BY lang
                             ORDER BY (doc_id * 48271) % 2147483647,
                                      doc_id) AS rn
                  FROM documents)
            SELECT r.lang, r.doc_id
            FROM r JOIN quota ON r.lang = quota.lang
            WHERE r.rn <= quota.qq
        """,
    "source_dup_rate": """
            WITH g AS (SELECT md5(text) AS h, count(*) AS sz
                       FROM documents GROUP BY 1),
            d AS (SELECT dd.source,
                         CASE WHEN g.sz > 1 THEN 1 ELSE 0 END AS dup
                  FROM documents dd JOIN g ON md5(dd.text) = g.h)
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(dup) AS BIGINT) AS n_duped,
                   CAST(CAST(sum(dup) AS BIGINT) AS DOUBLE)
                       / CAST(CAST(count(*) AS BIGINT) AS DOUBLE)
                       AS dup_rate
            FROM d GROUP BY 1
        """,
    "user_value_pareto": """
            WITH s AS (SELECT user_id,
                              CAST(sum(CAST(floor(CAST(value AS DOUBLE)
                                   * 100) AS BIGINT)) AS BIGINT) AS v
                       FROM events GROUP BY 1),
            t AS (SELECT CAST(count(*) AS BIGINT) AS nu,
                         CAST(sum(v) AS BIGINT) AS tot FROM s),
            r AS (SELECT v,
                         sum(v) OVER (ORDER BY v DESC, user_id
                                      ROWS UNBOUNDED PRECEDING) AS cum,
                         row_number() OVER (ORDER BY v DESC, user_id)
                             AS rn
                  FROM s)
            SELECT t.nu AS n_users,
                   (SELECT CAST(min(rn) AS BIGINT) FROM r
                    WHERE 5 * r.cum >= 4 * t.tot) AS n_users_80,
                   t.tot AS total_cents
            FROM t
        """,
    "rolling_active_users": """
            WITH ud AS (SELECT DISTINCT user_id,
                               date_diff('day', DATE '1970-01-01',
                                         CAST(ts AS DATE)) AS d
                        FROM events),
            days AS (SELECT DISTINCT d FROM ud)
            SELECT days.d AS day,
                   CAST(count(DISTINCT ud.user_id) AS BIGINT) AS active_7d
            FROM days JOIN ud ON ud.d BETWEEN days.d - 6 AND days.d
            GROUP BY 1
        """,
    "click_to_purchase_median": """
            WITH c AS (SELECT user_id, min(ts) AS t0 FROM events
                       WHERE event_type = 'click' GROUP BY 1),
            p AS (SELECT e.user_id,
                         min(epoch_us(e.ts) - epoch_us(c.t0)) AS delta
                  FROM events e JOIN c ON e.user_id = c.user_id
                  WHERE e.event_type = 'purchase' AND e.ts >= c.t0
                  GROUP BY 1)
            SELECT CAST(count(*) AS BIGINT) AS n_users,
                   percentile_cont(0.5) WITHIN GROUP (ORDER BY delta)
                       AS median_delta_us
            FROM p
        """,
    "part_cheapest_supplier": """
            SELECT p_partkey, s_suppkey, s_name, best_price FROM (
                SELECT l.l_partkey AS p_partkey,
                       l.l_suppkey AS s_suppkey, s.s_name,
                       l.l_extendedprice AS best_price,
                       row_number() OVER (
                           PARTITION BY l.l_partkey
                           ORDER BY l.l_extendedprice, l.l_suppkey) AS rn
                FROM lineitem l JOIN supplier s
                     ON l.l_suppkey = s.s_suppkey)
            WHERE rn = 1
        """,
    "lang_type_token_ratio": """
            WITH toks AS (
                SELECT lang, unnest(string_split(trim(text), ' ')) AS t
                FROM documents WHERE length(trim(text)) > 0),
            f AS (SELECT lang, t FROM toks WHERE t <> ''),
            s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
                         CAST(count(DISTINCT t) AS BIGINT) AS n_distinct
                  FROM f GROUP BY 1)
            SELECT lang, n_tokens, n_distinct,
                   CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                       AS ttr
            FROM s
        """,
    "tpch_q6_forecast_revenue": """
            SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100)
                                 AS BIGINT)) AS BIGINT) AS revenue_cents,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
    "tpch_q10_returned": """
            SELECT c.c_custkey, c.c_name, n.n_name,
                   CAST(sum(CAST(floor(l.l_extendedprice
                                       * (1 - l.l_discount) * 100)
                                 AS BIGINT)) AS BIGINT) AS lost_cents
            FROM customer c, orders o, lineitem l, nation n
            WHERE c.c_custkey = o.o_custkey
              AND l.l_orderkey = o.o_orderkey
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1996-07-01'
              AND l.l_returnflag = 'R'
              AND c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2, 3
            ORDER BY lost_cents DESC, c.c_custkey LIMIT 20
        """,
    "tpch_q14_promo_share": """
            WITH j AS (
                SELECT CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                  * 100) AS BIGINT) AS cents,
                       p.p_type = 'PROMO' AS is_promo
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
                WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l.l_shipdate < TIMESTAMP '1997-01-01')
            SELECT CAST(sum(CASE WHEN is_promo THEN cents ELSE 0 END)
                        AS BIGINT) AS promo_cents,
                   CAST(sum(cents) AS BIGINT) AS total_cents,
                   100.0 * CAST(CAST(sum(CASE WHEN is_promo THEN cents
                                             ELSE 0 END) AS BIGINT)
                                AS DOUBLE)
                       / CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)
                       AS promo_share_pct
            FROM j
        """,
    "events_anomaly_hours": """
            WITH h AS (SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT)
                              AS hour,
                              CAST(count(*) AS BIGINT) AS c
                       FROM events GROUP BY 1),
            m AS (SELECT quantile_disc(c, 0.5) AS med FROM h),
            d AS (SELECT h.hour, h.c, abs(h.c - m.med) AS dev FROM h, m),
            md AS (SELECT quantile_disc(dev, 0.5) AS mad FROM d)
            SELECT d.hour, d.c AS n_events, CAST(d.dev AS BIGINT) AS abs_dev
            FROM d, md WHERE d.dev > 3 * md.mad
        """,
    "order_fulfillment_lag": """
            WITH l AS (SELECT l_orderkey, max(l_shipdate) AS ship
                       FROM lineitem GROUP BY 1),
            j AS (SELECT o.o_orderpriority AS prio,
                         epoch_us(l.ship) - epoch_us(o.o_orderdate)
                             AS lag_us
                  FROM orders o JOIN l ON o.o_orderkey = l.l_orderkey)
            SELECT prio AS o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   percentile_cont(0.25) WITHIN GROUP (ORDER BY lag_us)
                       AS lag_q1,
                   percentile_cont(0.5) WITHIN GROUP (ORDER BY lag_us)
                       AS lag_med,
                   percentile_cont(0.75) WITHIN GROUP (ORDER BY lag_us)
                       AS lag_q3
            FROM j GROUP BY 1
        """,
    "source_mixture_weights": """
            WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                              CAST(sum(CASE WHEN trim(text) = '' THEN 0
                                   ELSE length(regexp_split_to_array(
                                        trim(text), '\\s+')) END)
                                   AS BIGINT) AS n_tokens
                       FROM documents GROUP BY 1),
            t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot,
                         CAST(count(*) AS BIGINT) AS ns FROM s)
            SELECT s.source, s.n_docs, s.n_tokens,
                   CAST(t.tot AS DOUBLE)
                       / CAST(t.ns * s.n_tokens AS DOUBLE) AS weight
            FROM s, t
        """,
    "dup_cluster_histogram": """
            WITH g AS (SELECT md5(text) AS h, count(*) AS sz
                       FROM documents GROUP BY 1)
            SELECT CAST(sz AS BIGINT) AS cluster_size,
                   CAST(count(*) AS BIGINT) AS n_clusters
            FROM g GROUP BY 1
        """,
    "user_out_of_order_events": """
            WITH w AS (
                SELECT user_id, ts,
                       max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS mx
                FROM events)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CASE WHEN ts < mx THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_out_of_order,
                   CAST(max(CASE WHEN ts < mx
                                 THEN epoch_us(mx) - epoch_us(ts)
                                 ELSE 0 END) AS BIGINT)
                       AS max_lateness_us
            FROM w GROUP BY user_id
        """,
    "events_daily_autocorr": """
            WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                        CAST(ts AS DATE)) AS day,
                              CAST(count(*) AS BIGINT) AS c
                       FROM events GROUP BY 1),
            p AS (SELECT a.c AS x, b.c AS y
                  FROM d a JOIN d b ON b.day = a.day + 1)
            SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(sum(x) AS BIGINT) AS sum_x,
                   CAST(sum(y) AS BIGINT) AS sum_y,
                   CAST(sum(x*x) AS BIGINT) AS sum_xx,
                   CAST(sum(y*y) AS BIGINT) AS sum_yy,
                   CAST(sum(x*y) AS BIGINT) AS sum_xy,
                   CASE WHEN (count(*)*sum(x*x) - sum(x)*sum(x))
                             * (count(*)*sum(y*y) - sum(y)*sum(y)) > 0
                        THEN CAST(count(*)*sum(x*y) - sum(x)*sum(y)
                                  AS DOUBLE)
                             / sqrt(CAST((count(*)*sum(x*x)
                                          - sum(x)*sum(x))
                                         * (count(*)*sum(y*y)
                                            - sum(y)*sum(y)) AS DOUBLE))
                        END AS r
            FROM p HAVING count(*) > 0
        """,
    "documents_profile_drift": """
            WITH newsnap AS (
                SELECT CASE WHEN doc_id % 13 = 0 THEN text || ' v2'
                            ELSE text END AS text, lang, source
                FROM documents WHERE doc_id % 17 <> 0
                UNION ALL
                SELECT text, lang, source FROM documents
                WHERE doc_id % 19 = 0
            ),
            pb AS (
                SELECT 'text' AS col, count(*) AS n_rows,
                       count(DISTINCT text) AS nd,
                       CAST(sum(strlen(text)) AS BIGINT) AS sl
                FROM documents
                UNION ALL
                SELECT 'lang', count(*), count(DISTINCT lang),
                       CAST(sum(strlen(lang)) AS BIGINT) FROM documents
                UNION ALL
                SELECT 'source', count(*), count(DISTINCT source),
                       CAST(sum(strlen(source)) AS BIGINT) FROM documents
            ),
            pn AS (
                SELECT 'text' AS col, count(*) AS n_rows,
                       count(DISTINCT text) AS nd,
                       CAST(sum(strlen(text)) AS BIGINT) AS sl
                FROM newsnap
                UNION ALL
                SELECT 'lang', count(*), count(DISTINCT lang),
                       CAST(sum(strlen(lang)) AS BIGINT) FROM newsnap
                UNION ALL
                SELECT 'source', count(*), count(DISTINCT source),
                       CAST(sum(strlen(source)) AS BIGINT) FROM newsnap
            )
            SELECT pb.col AS "column",
                   CAST(pb.n_rows AS BIGINT) AS n_rows_base,
                   CAST(pn.n_rows AS BIGINT) AS n_rows_new,
                   CAST(pn.n_rows - pb.n_rows AS BIGINT) AS rows_delta,
                   CAST(pb.nd AS BIGINT) AS distinct_base,
                   CAST(pn.nd AS BIGINT) AS distinct_new,
                   CAST(pn.nd - pb.nd AS BIGINT) AS distinct_delta,
                   pb.sl AS sum_len_base, pn.sl AS sum_len_new,
                   CAST(pn.sl - pb.sl AS BIGINT) AS len_delta
            FROM pb JOIN pn ON pb.col = pn.col
        """,
    "event_nearest_order": """
            WITH o AS (
                SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
                FROM orders GROUP BY 1, 2
            )
            SELECT event_id, user_id, o_orderkey, gap_us FROM (
                SELECT e.event_id, e.user_id, o.o_orderkey,
                       abs(epoch_us(e.ts) - epoch_us(o.o_orderdate))
                           AS gap_us,
                       row_number() OVER (
                           PARTITION BY e.event_id
                           ORDER BY abs(epoch_us(e.ts)
                                        - epoch_us(o.o_orderdate)),
                                    o.o_orderdate, o.o_orderkey) AS rn
                FROM events e JOIN o ON e.user_id = o.o_custkey)
            WHERE rn = 1
        """,
    "segment_acctbal_gini": """
            WITH c AS (SELECT c_mktsegment AS seg,
                              CAST(floor(CAST(c_acctbal AS DOUBLE) * 100)
                                   AS BIGINT) AS b
                       FROM customer),
            r AS (SELECT seg, b,
                         row_number() OVER (PARTITION BY seg ORDER BY b)
                             AS rk
                  FROM c)
            SELECT seg AS c_mktsegment,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(2 * sum(rk * b) - (count(*) + 1) * sum(b)
                        AS BIGINT) AS gini_num,
                   CAST(count(*) * sum(b) AS BIGINT) AS gini_den,
                   CAST(CAST(2 * sum(rk * b) - (count(*) + 1) * sum(b)
                             AS BIGINT) AS DOUBLE)
                       / CAST(CAST(count(*) * sum(b) AS BIGINT) AS DOUBLE)
                       AS gini
            FROM r GROUP BY seg
        """,
    "customer_rfm": """
            WITH m AS (SELECT o_custkey AS ck,
                              max(epoch_us(o_orderdate)) AS r,
                              CAST(count(*) AS BIGINT) AS f,
                              CAST(sum(CAST(floor(CAST(o_totalprice
                                   AS DOUBLE) * 100) AS BIGINT))
                                   AS BIGINT) AS mo
                       FROM orders GROUP BY 1),
            t AS (SELECT quantile_cont(CAST(r AS DOUBLE),
                                       [0.25, 0.5, 0.75]) AS tr,
                         quantile_cont(CAST(f AS DOUBLE),
                                       [0.25, 0.5, 0.75]) AS tf,
                         quantile_cont(CAST(mo AS DOUBLE),
                                       [0.25, 0.5, 0.75]) AS tm
                  FROM m)
            SELECT m.ck AS c_custkey,
                   CAST(1 + len(list_filter(t.tr,
                                x -> x < CAST(m.r AS DOUBLE)))
                        AS BIGINT) AS r_score,
                   CAST(1 + len(list_filter(t.tf,
                                x -> x < CAST(m.f AS DOUBLE)))
                        AS BIGINT) AS f_score,
                   CAST(1 + len(list_filter(t.tm,
                                x -> x < CAST(m.mo AS DOUBLE)))
                        AS BIGINT) AS m_score
            FROM m, t
        """,
    "term_postings": """
            WITH toks AS (
                SELECT DISTINCT doc_id, t AS term
                FROM (SELECT doc_id,
                             unnest(string_split(trim(text), ' ')) AS t
                      FROM documents WHERE length(trim(text)) > 0)
                WHERE t <> ''
            ), n AS (SELECT count(*) AS c FROM documents)
            SELECT term, CAST(count(*) AS BIGINT) AS df,
                   array_to_string(list(doc_id ORDER BY doc_id), ',')
                       AS postings
            FROM toks, n GROUP BY term, c HAVING count(*) * 50 >= c
        """,
    "documents_scd2": """
            WITH delta AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 20 = 0 THEN upper(text)
                            ELSE text END AS text
                FROM documents WHERE doc_id % 10 = 0
                UNION ALL
                SELECT doc_id + 10000000 AS doc_id, text
                FROM documents WHERE doc_id % 25 = 0
            ), base AS (SELECT doc_id, text FROM documents)
            SELECT b.doc_id, b.text,
                   0 AS valid_from, 100 AS valid_to, 0 AS is_current
            FROM base b JOIN delta d USING (doc_id) WHERE b.text <> d.text
            UNION ALL
            SELECT b.doc_id, b.text, 0, 9999, 1
            FROM base b LEFT JOIN delta d USING (doc_id)
            WHERE d.doc_id IS NULL OR b.text = d.text
            UNION ALL
            SELECT d.doc_id, d.text, 100, 9999, 1
            FROM delta d LEFT JOIN base b USING (doc_id)
            WHERE b.doc_id IS NULL OR b.text <> d.text
        """,
    "cosine_threshold_calibration": """
            WITH p AS (
                SELECT list_cosine_similarity(a.embedding::DOUBLE[],
                                              b.embedding::DOUBLE[]) AS cos
                FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
                WHERE a.vec_id % 2 = 0 AND (a.vec_id // 2) % 20 = 0
            )
            SELECT CAST(floor(cos * 10.0) AS BIGINT) AS cos_bin,
                   count(*) AS n_pairs
            FROM p GROUP BY 1
        """,
    "attribution_pairs": """
            SELECT c.event_id AS click_id, p.event_id AS purchase_id,
                   epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
            FROM events c JOIN events p
              ON c.user_id = p.user_id
             AND c.event_type = 'click' AND p.event_type = 'purchase'
             AND p.ts > c.ts
             AND p.ts <= c.ts + INTERVAL 6 HOUR
        """,
    "dedup_eval_prefix_vs_exact": """
            WITH gold AS (
                SELECT a.doc_id AS ia, b.doc_id AS ib
                FROM documents a JOIN documents b
                  ON a.text = b.text AND a.doc_id < b.doc_id
            ), pred AS (
                SELECT a.doc_id AS ia, b.doc_id AS ib
                FROM documents a JOIN documents b
                  ON substr(a.text, 1, 40) = substr(b.text, 1, 40)
                 AND a.doc_id < b.doc_id
            ), tpq AS (
                SELECT count(*) AS tp FROM pred JOIN gold USING (ia, ib)
            )
            SELECT (SELECT count(*) FROM pred) AS n_pred,
                   (SELECT count(*) FROM gold) AS n_gold,
                   tp,
                   (SELECT count(*) FROM pred) - tp AS fp,
                   (SELECT count(*) FROM gold) - tp AS fn,
                   CASE WHEN (SELECT count(*) FROM pred) = 0 THEN 1.0
                        ELSE CAST(tp AS DOUBLE)
                             / (SELECT count(*) FROM pred) END AS precision,
                   CASE WHEN (SELECT count(*) FROM gold) = 0 THEN 1.0
                        ELSE CAST(tp AS DOUBLE)
                             / (SELECT count(*) FROM gold) END AS recall
            FROM tpq
        """,
    "segment_revenue_share": """
            WITH s AS (
                SELECT c_mktsegment,
                       CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT))
                            AS BIGINT) AS total_cents
                FROM orders JOIN customer ON o_custkey = c_custkey
                GROUP BY c_mktsegment
            )
            SELECT c_mktsegment, total_cents,
                   CAST(total_cents AS DOUBLE)
                     / (SELECT CAST(sum(total_cents) AS DOUBLE) FROM s)
                       AS revenue_share
            FROM s
        """,
    "user_value_trend": """
            WITH e AS (
                SELECT user_id,
                       (epoch_us(ts) - (SELECT min(epoch_us(ts)) FROM events))
                           // 1000000 AS x,
                       CAST(floor(value * 1000.0) AS BIGINT) AS y
                FROM events
            )
            SELECT user_id, count(*) AS n,
                   CAST(CAST(count(*) * sum(x*y) - sum(x) * sum(y) AS BIGINT)
                        AS DOUBLE)
                 / CAST(CAST(count(*) * sum(x*x) - sum(x) * sum(x) AS BIGINT)
                        AS DOUBLE) AS slope_milli_per_sec
            FROM e GROUP BY user_id
            HAVING count(*) * sum(x*x) - sum(x) * sum(x) > 0
        """,
    "source_top_lang": """
            SELECT source, lang AS top_lang, n FROM (
                SELECT source, lang, count(*) AS n,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY count(*) DESC, lang) AS rn
                FROM documents GROUP BY source, lang
            ) WHERE rn = 1
        """,
    "event_type_distinct_users": """
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
    "embedding_covariance": """
            WITH ex AS (
                SELECT vec_id,
                       unnest(range(1, 9)) AS i,
                       unnest(list_transform(
                           embedding[1:8], x -> CAST(x AS DOUBLE)
                       )) AS vi
                FROM embeddings
            )
            SELECT a.i - 1 AS i, b.i - 1 AS j,
                   CAST(sum(CAST(floor(a.vi * b.vi * 1000000.0) AS BIGINT))
                        AS BIGINT) AS m_micro
            FROM ex a JOIN ex b USING (vec_id)
            WHERE a.i <= b.i
            GROUP BY 1, 2
        """,
    "documents_profile": """
            SELECT 'text' AS "column", count(*) AS n_rows,
                   count(*) - count(text) AS n_null,
                   count(DISTINCT text) AS n_distinct,
                   CAST(min(strlen(text)) AS BIGINT) AS min_len,
                   CAST(max(strlen(text)) AS BIGINT) AS max_len,
                   CAST(sum(strlen(text)) AS BIGINT) AS sum_len
            FROM documents
            UNION ALL
            SELECT 'lang', count(*), count(*) - count(lang),
                   count(DISTINCT lang),
                   CAST(min(strlen(lang)) AS BIGINT),
                   CAST(max(strlen(lang)) AS BIGINT),
                   CAST(sum(strlen(lang)) AS BIGINT)
            FROM documents
            UNION ALL
            SELECT 'source', count(*), count(*) - count(source),
                   count(DISTINCT source),
                   CAST(min(strlen(source)) AS BIGINT),
                   CAST(max(strlen(source)) AS BIGINT),
                   CAST(sum(strlen(source)) AS BIGINT)
            FROM documents
        """,
    "priority_price_iqr": """
            WITH o AS (
                SELECT o_orderpriority,
                       CAST(CAST(floor(o_totalprice * 100.0) AS BIGINT)
                            AS DOUBLE) AS cents
                FROM orders
            )
            SELECT o_orderpriority,
                   quantile_cont(cents, 0.25) AS q1_cents,
                   quantile_cont(cents, 0.5) AS median_cents,
                   quantile_cont(cents, 0.75) AS q3_cents,
                   count(*) AS n_orders
            FROM o GROUP BY o_orderpriority
        """,
    "user_activity_histogram": """
            SELECT cnt AS n_events, count(*) AS n_users
            FROM (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
            GROUP BY cnt
        """,
    "documents_snapshot_diff": """
            WITH old AS (
                SELECT doc_id, text FROM documents
            ), new AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 13 = 0 THEN text || ' v2'
                            ELSE text END AS text
                FROM documents WHERE doc_id % 17 <> 0
                UNION ALL
                SELECT doc_id + 10000000 AS doc_id, text
                FROM documents WHERE doc_id % 19 = 0
            )
            SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        ELSE 'changed' END AS status
            FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
            WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.text <> n.text
        """,
    "tpch_q18_large_orders": """
            WITH big AS (SELECT l_orderkey,
                                CAST(sum(CAST(floor(l_quantity) AS BIGINT))
                                     AS BIGINT) AS sum_qty
                         FROM lineitem GROUP BY 1
                         HAVING sum(CAST(floor(l_quantity) AS BIGINT)) > 250)
            SELECT c.c_custkey, c.c_name, o.o_orderkey,
                   CAST(floor(o.o_totalprice * 100) AS BIGINT)
                       AS total_cents,
                   b.sum_qty
            FROM big b
            JOIN orders o ON o.o_orderkey = b.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
        """,
    "tpch_q16_supplier_counts": """
            WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
            SELECT p.p_brand, p.p_type,
                   CAST(p.p_size AS BIGINT) AS p_size,
                   CAST(count(DISTINCT ps.l_suppkey) AS BIGINT)
                       AS supplier_cnt
            FROM ps JOIN part p ON ps.l_partkey = p.p_partkey
            WHERE p.p_brand <> 'Brand#13' AND p.p_type <> 'PROMO'
              AND ps.l_suppkey NOT IN (
                  SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
            GROUP BY 1, 2, 3
        """,
    "tpch_q22_dormant_customers": """
            WITH t AS (SELECT CAST(sum(CAST(floor(
                                  CAST(c_acctbal AS DOUBLE) * 100)
                                  AS BIGINT)) AS BIGINT) AS s,
                              CAST(count(*) AS BIGINT) AS n
                       FROM customer WHERE c_acctbal > 0),
            recent AS (SELECT DISTINCT o_custkey FROM orders
                       WHERE o_orderdate >= TIMESTAMP '2000-01-01')
            SELECT n.n_name,
                   CAST(count(*) AS BIGINT) AS numcust,
                   CAST(sum(CAST(floor(CAST(c.c_acctbal AS DOUBLE) * 100)
                                 AS BIGINT)) AS BIGINT) AS tot_cents
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE CAST(floor(CAST(c.c_acctbal AS DOUBLE) * 100) AS BIGINT)
                      * (SELECT n FROM t) > (SELECT s FROM t)
              AND c.c_custkey NOT IN (SELECT o_custkey FROM recent)
            GROUP BY 1
        """,
    "tpch_q9_product_profit": """
            WITH pc AS (SELECT p_partkey,
                               CAST(floor(CAST(p_retailprice AS DOUBLE)
                                          * 100) AS BIGINT) // 2
                                   AS cost_cents
                        FROM part WHERE p_name LIKE '%bolt%')
            SELECT n.n_name,
                   CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(sum(CAST(floor(l.l_extendedprice
                                       * (1 - l.l_discount) * 100)
                                 AS BIGINT)
                            - CAST(floor(l.l_quantity) AS BIGINT)
                              * pc.cost_cents) AS BIGINT) AS profit_cents
            FROM lineitem l
            JOIN pc ON l.l_partkey = pc.p_partkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            GROUP BY 1, 2
        """,
    "tpch_q11_important_parts": """
            WITH natsupp AS (SELECT s_suppkey FROM supplier s
                             JOIN nation n
                               ON s.s_nationkey = n.n_nationkey
                             WHERE n.n_name = 'NATION_3'),
            v AS (SELECT l_partkey AS p_partkey,
                         CAST(sum(CAST(floor(l_extendedprice * 100)
                                       AS BIGINT)) AS BIGINT) AS value_cents
                  FROM lineitem
                  WHERE l_suppkey IN (SELECT s_suppkey FROM natsupp)
                  GROUP BY 1),
            t AS (SELECT CAST(sum(value_cents) AS BIGINT) AS tot,
                         CAST(count(*) AS BIGINT) AS n FROM v)
            SELECT v.p_partkey, v.value_cents
            FROM v, t WHERE v.value_cents * t.n > 2 * t.tot
        """,
    "orders_totalprice_recon": """
            WITH ls AS (SELECT l_orderkey,
                               CAST(sum(CAST(floor(l_extendedprice
                                                   * (1 + l_tax)
                                                   * (1 - l_discount)
                                                   * 100) AS BIGINT))
                                    AS BIGINT) AS comp
                        FROM lineitem GROUP BY 1)
            SELECT o.o_orderstatus,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CASE WHEN CAST(floor(o.o_totalprice * 100)
                                          AS BIGINT) <> ls.comp
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_mismatch,
                   CAST(sum(abs(CAST(floor(o.o_totalprice * 100)
                                     AS BIGINT) - ls.comp)) AS BIGINT)
                       AS sum_absdiff_cents
            FROM orders o JOIN ls ON ls.l_orderkey = o.o_orderkey
            GROUP BY 1
        """,
    "orders_benford": """
            SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders WHERE floor(o_totalprice) >= 1
            GROUP BY 1
        """,
    "event_type_user_overlap": """
            WITH ut AS (SELECT DISTINCT user_id, event_type
                        FROM events WHERE value >= 250.0)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM ut a JOIN ut b ON a.user_id = b.user_id
                              AND a.event_type < b.event_type
            GROUP BY 1, 2
        """,
    "lineitem_corr_matrix": """
            WITH m AS (SELECT
                CAST(count(*) AS HUGEINT) AS n,
                sum(CAST(CAST(floor(l_quantity) AS BIGINT) AS HUGEINT))
                    AS s_qty,
                sum(CAST(CAST(floor(l_extendedprice * 100) AS BIGINT)
                         AS HUGEINT)) AS s_ep,
                sum(CAST(CAST(floor(CAST(l_discount AS DOUBLE) * 100)
                              AS BIGINT) AS HUGEINT)) AS s_disc,
                sum(CAST(CAST(floor(CAST(l_tax AS DOUBLE) * 100)
                              AS BIGINT) AS HUGEINT)) AS s_tax,
                sum(CAST(CAST(floor(l_quantity) AS BIGINT) AS HUGEINT)
                    * CAST(CAST(floor(l_quantity) AS BIGINT) AS HUGEINT))
                    AS ss_qty,
                sum(CAST(CAST(floor(l_extendedprice * 100) AS BIGINT)
                         AS HUGEINT)
                    * CAST(CAST(floor(l_extendedprice * 100) AS BIGINT)
                           AS HUGEINT)) AS ss_ep,
                sum(CAST(CAST(floor(CAST(l_discount AS DOUBLE) * 100)
                              AS BIGINT) AS HUGEINT)
                    * CAST(CAST(floor(CAST(l_discount AS DOUBLE) * 100)
                                AS BIGINT) AS HUGEINT)) AS ss_disc,
                sum(CAST(CAST(floor(CAST(l_tax AS DOUBLE) * 100)
                              AS BIGINT) AS HUGEINT)
                    * CAST(CAST(floor(CAST(l_tax AS DOUBLE) * 100)
                                AS BIGINT) AS HUGEINT)) AS ss_tax,
                sum(CAST(CAST(floor(l_quantity) AS BIGINT) AS HUGEINT)
                    * CAST(CAST(floor(l_extendedprice * 100) AS BIGINT)
                           AS HUGEINT)) AS x_qty_ep,
                sum(CAST(CAST(floor(l_quantity) AS BIGINT) AS HUGEINT)
                    * CAST(CAST(floor(CAST(l_discount AS DOUBLE) * 100)
                                AS BIGINT) AS HUGEINT)) AS x_qty_disc,
                sum(CAST(CAST(floor(l_quantity) AS BIGINT) AS HUGEINT)
                    * CAST(CAST(floor(CAST(l_tax AS DOUBLE) * 100)
                                AS BIGINT) AS HUGEINT)) AS x_qty_tax,
                sum(CAST(CAST(floor(l_extendedprice * 100) AS BIGINT)
                         AS HUGEINT)
                    * CAST(CAST(floor(CAST(l_discount AS DOUBLE) * 100)
                                AS BIGINT) AS HUGEINT)) AS x_ep_disc,
                sum(CAST(CAST(floor(l_extendedprice * 100) AS BIGINT)
                         AS HUGEINT)
                    * CAST(CAST(floor(CAST(l_tax AS DOUBLE) * 100)
                                AS BIGINT) AS HUGEINT)) AS x_ep_tax,
                sum(CAST(CAST(floor(CAST(l_discount AS DOUBLE) * 100)
                              AS BIGINT) AS HUGEINT)
                    * CAST(CAST(floor(CAST(l_tax AS DOUBLE) * 100)
                                AS BIGINT) AS HUGEINT)) AS x_disc_tax
                FROM lineitem)
            SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
                   CAST(n * x_qty_ep - s_qty * s_ep AS DOUBLE)
                   / sqrt(CAST(n * ss_qty - s_qty * s_qty AS DOUBLE)
                          * CAST(n * ss_ep - s_ep * s_ep AS DOUBLE))
                       AS corr,
                   CAST(n AS BIGINT) AS n_rows
            FROM m
            UNION ALL
            SELECT 'l_quantity', 'l_discount',
                   CAST(n * x_qty_disc - s_qty * s_disc AS DOUBLE)
                   / sqrt(CAST(n * ss_qty - s_qty * s_qty AS DOUBLE)
                          * CAST(n * ss_disc - s_disc * s_disc AS DOUBLE)),
                   CAST(n AS BIGINT)
            FROM m
            UNION ALL
            SELECT 'l_quantity', 'l_tax',
                   CAST(n * x_qty_tax - s_qty * s_tax AS DOUBLE)
                   / sqrt(CAST(n * ss_qty - s_qty * s_qty AS DOUBLE)
                          * CAST(n * ss_tax - s_tax * s_tax AS DOUBLE)),
                   CAST(n AS BIGINT)
            FROM m
            UNION ALL
            SELECT 'l_extendedprice', 'l_discount',
                   CAST(n * x_ep_disc - s_ep * s_disc AS DOUBLE)
                   / sqrt(CAST(n * ss_ep - s_ep * s_ep AS DOUBLE)
                          * CAST(n * ss_disc - s_disc * s_disc AS DOUBLE)),
                   CAST(n AS BIGINT)
            FROM m
            UNION ALL
            SELECT 'l_extendedprice', 'l_tax',
                   CAST(n * x_ep_tax - s_ep * s_tax AS DOUBLE)
                   / sqrt(CAST(n * ss_ep - s_ep * s_ep AS DOUBLE)
                          * CAST(n * ss_tax - s_tax * s_tax AS DOUBLE)),
                   CAST(n AS BIGINT)
            FROM m
            UNION ALL
            SELECT 'l_discount', 'l_tax',
                   CAST(n * x_disc_tax - s_disc * s_tax AS DOUBLE)
                   / sqrt(CAST(n * ss_disc - s_disc * s_disc AS DOUBLE)
                          * CAST(n * ss_tax - s_tax * s_tax AS DOUBLE)),
                   CAST(n AS BIGINT)
            FROM m
        """,
    "documents_expectations": """
            SELECT 'doc_id_unique' AS rule,
                   CAST(count(*) - count(DISTINCT doc_id) AS BIGINT)
                       AS n_violations
            FROM documents
            UNION ALL
            SELECT 'lang_format',
                   CAST(sum(CASE WHEN lang IS NULL
                                   OR NOT regexp_matches(
                                          lang, '^[a-z]{2,3}$')
                                 THEN 1 ELSE 0 END) AS BIGINT)
            FROM documents
            UNION ALL
            SELECT 'n_chars_consistent',
                   CAST(sum(CASE WHEN text IS NULL
                                   OR n_chars <> length(text)
                                 THEN 1 ELSE 0 END) AS BIGINT)
            FROM documents
            UNION ALL
            SELECT 'source_nonempty',
                   CAST(sum(CASE WHEN source IS NULL OR source = ''
                                 THEN 1 ELSE 0 END) AS BIGINT)
            FROM documents
            UNION ALL
            SELECT 'text_nonnull',
                   CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM documents
        """,
    "lang_source_contingency": """
            WITH c AS (SELECT lang, source,
                              CAST(count(*) AS BIGINT) AS n
                       FROM documents GROUP BY 1, 2),
            r AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nr
                  FROM c GROUP BY 1),
            s AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns
                  FROM c GROUP BY 1),
            t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c)
            SELECT c.lang, c.source, c.n AS observed,
                   CAST(r.nr AS DOUBLE) * CAST(s.ns AS DOUBLE)
                       / CAST(t.nt AS DOUBLE) AS expected
            FROM c
            JOIN r ON c.lang = r.lang
            JOIN s ON c.source = s.source, t
        """,
    "events_type_mad": """
            WITH m AS (SELECT event_type,
                              median(CAST(value AS DOUBLE)) AS med
                       FROM events GROUP BY 1)
            SELECT e.event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   median(abs(CAST(e.value AS DOUBLE) - m.med)) AS mad
            FROM events e JOIN m ON e.event_type = m.event_type
            GROUP BY 1
        """,
    "event_trigrams": """
            WITH o AS (SELECT event_type AS t1,
                              lead(event_type, 1) OVER w AS t2,
                              lead(event_type, 2) OVER w AS t3
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id))
            SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
            FROM o WHERE t3 IS NOT NULL GROUP BY 1, 2, 3
        """,
    "orders_mom_growth": """
            WITH m AS (
                SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
                       CAST(SUM(CAST(FLOOR(CAST(o_totalprice AS DOUBLE)
                                           * 100) AS BIGINT)) AS BIGINT)
                           AS revenue_cents
                FROM orders GROUP BY 1
            )
            SELECT ym, revenue_cents,
                   lag(revenue_cents) OVER (ORDER BY ym)
                       AS prev_revenue_cents,
                   revenue_cents - lag(revenue_cents) OVER (ORDER BY ym)
                       AS delta_cents
            FROM m
            QUALIFY lag(revenue_cents) OVER (ORDER BY ym) IS NOT NULL
        """,
    "customer_cohort_orders": """
            WITH um AS (SELECT DISTINCT o_custkey,
                               year(o_orderdate) * 100
                               + month(o_orderdate) AS ym
                        FROM orders),
            c AS (SELECT o_custkey, min(ym) AS cohort_ym
                  FROM um GROUP BY 1)
            SELECT c.cohort_ym, um.ym, CAST(count(*) AS BIGINT) AS n_custs
            FROM um JOIN c ON um.o_custkey = c.o_custkey
            GROUP BY 1, 2
        """,
    "part_major_suppliers": """
            WITH ps AS (SELECT l_partkey, l_suppkey,
                               CAST(SUM(CAST(l_quantity AS BIGINT))
                                    AS BIGINT) AS q
                        FROM lineitem GROUP BY 1, 2),
            pt AS (SELECT l_partkey, CAST(SUM(q) AS BIGINT) AS tot
                   FROM ps GROUP BY 1)
            SELECT s_suppkey, s_name,
                   CAST(count(*) AS BIGINT) AS n_major_parts
            FROM ps
            JOIN pt ON ps.l_partkey = pt.l_partkey
            JOIN supplier ON s_suppkey = ps.l_suppkey
            WHERE 8 * q > tot
            GROUP BY 1, 2
        """,
    "tpch_q12_shipping_lag": """
            WITH fl AS (SELECT l_orderkey, min(l_shipdate) AS f
                        FROM lineitem GROUP BY 1)
            SELECT LEAST(GREATEST((epoch_us(f) // 86400000000
                                   - epoch_us(o_orderdate) // 86400000000)
                                  // 7, 0), 8) AS lag_weeks,
                   CAST(SUM(CASE WHEN o_orderpriority IN
                                      ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS high_n,
                   CAST(SUM(CASE WHEN o_orderpriority IN
                                      ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT) AS low_n
            FROM orders JOIN fl ON o_orderkey = l_orderkey
            GROUP BY 1
        """,
    "user_type_runs": """
            WITH s AS (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn,
                       row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) AS rt
                FROM events
            ),
            runs AS (
                SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS len
                FROM s GROUP BY user_id, event_type, rn - rt
            )
            SELECT user_id, event_type,
                   CAST(max(len) AS BIGINT) AS longest_run,
                   CAST(count(*) AS BIGINT) AS n_runs
            FROM runs GROUP BY 1, 2
        """,
    "event_value_zscore": """
            WITH e AS (SELECT event_id, event_type,
                              CAST(FLOOR(CAST(value AS DOUBLE) * 100)
                                   AS BIGINT) AS value_cents
                       FROM events),
            m AS (SELECT event_type,
                         CAST(count(*) AS HUGEINT) AS n,
                         CAST(sum(value_cents) AS HUGEINT) AS s,
                         CAST(sum(CAST(value_cents AS HUGEINT)
                                  * value_cents) AS HUGEINT) AS ss
                  FROM e GROUP BY 1)
            SELECT event_id, e.event_type, value_cents
            FROM e JOIN m ON e.event_type = m.event_type
            WHERE n >= 2
              AND (n * value_cents - s) * (n * value_cents - s)
                  > 9 * (n * ss - s * s)
        """,
    # deterministic document graph: binary tree on k = doc_id + 1 plus
    # data-derived skip edges k -> k + 1 + (n_chars % 64); UNION dedups
    # coinciding tree/skip edges exactly like the Ray-side edge builder
    "doc_graph_bfs_levels": """
            WITH RECURSIVE
            nn AS (SELECT count(*) AS n FROM documents),
            e AS (
                SELECT doc_id + 1 AS u, (doc_id + 1) * 2 AS v
                FROM documents, nn WHERE (doc_id + 1) * 2 <= nn.n
                UNION
                SELECT doc_id + 1, (doc_id + 1) * 2 + 1
                FROM documents, nn WHERE (doc_id + 1) * 2 + 1 <= nn.n
                UNION
                SELECT doc_id + 1, doc_id + 2 + (n_chars % 64)
                FROM documents, nn
                WHERE doc_id + 2 + (n_chars % 64) <= nn.n
            ),
            bfs AS (
                SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS level
                UNION
                SELECT e.v, bfs.level + 1
                FROM bfs JOIN e ON e.u = bfs.node
                WHERE bfs.level < 40
            )
            SELECT node - 1 AS doc_id, CAST(min(level) AS BIGINT) AS level
            FROM bfs GROUP BY 1
        """,
    # bounded-radius weighted SSSP: same edge CTE, weight 1 + (u+v)%3,
    # prune at d_max=48 (prefix weights never exceed the total, so the
    # prune is exact); semi-naive recursion terminates because (node, d)
    # pairs are bounded integers
    "doc_graph_sssp": """
            WITH RECURSIVE
            nn AS (SELECT count(*) AS n FROM documents),
            e AS (
                SELECT doc_id + 1 AS u, (doc_id + 1) * 2 AS v
                FROM documents, nn WHERE (doc_id + 1) * 2 <= nn.n
                UNION
                SELECT doc_id + 1, (doc_id + 1) * 2 + 1
                FROM documents, nn WHERE (doc_id + 1) * 2 + 1 <= nn.n
                UNION
                SELECT doc_id + 1, doc_id + 2 + (n_chars % 64)
                FROM documents, nn
                WHERE doc_id + 2 + (n_chars % 64) <= nn.n
            ),
            sp AS (
                SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS d
                UNION
                SELECT e.v, sp.d + 1 + (e.u + e.v) % 3
                FROM sp JOIN e ON e.u = sp.node
                WHERE sp.d + 1 + (e.u + e.v) % 3 <= 48
            )
            SELECT node - 1 AS doc_id, CAST(min(d) AS BIGINT) AS dist
            FROM sp GROUP BY 1
        """,
    # Q2 analog: partsupp is DERIVED — s supplies p iff (s+p) % 2 = 0 at
    # integer-cents cost retail*(60+(s*7+p)%40)//100; min-cost EUROPE
    # supplier per bracket part, cost ties -> smallest s_suppkey
    "tpch_q2_min_cost_supplier": """
            WITH eu AS (
                SELECT s.s_suppkey, s.s_name,
                       CAST(floor(CAST(s.s_acctbal AS DOUBLE) * 100)
                            AS BIGINT) AS acctbal_cents,
                       n.n_name
                FROM supplier s
                JOIN nation n ON s.s_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
                WHERE r.r_name = 'EUROPE'
            ),
            p AS (
                SELECT p_partkey,
                       CAST(floor(CAST(p_retailprice AS DOUBLE) * 100)
                            AS BIGINT) AS retail_cents
                FROM part WHERE p_size % 10 = 3
            ),
            ps AS (
                SELECT p.p_partkey, eu.s_suppkey, eu.s_name, eu.n_name,
                       eu.acctbal_cents,
                       p.retail_cents
                           * (60 + (eu.s_suppkey * 7 + p.p_partkey) % 40)
                           // 100 AS cost_cents
                FROM p JOIN eu ON (eu.s_suppkey + p.p_partkey) % 2 = 0
            ),
            m AS (
                SELECT p_partkey, min(cost_cents) AS min_cost_cents
                FROM ps GROUP BY 1
            ),
            sel AS (
                SELECT ps.p_partkey, min(ps.s_suppkey) AS s_suppkey
                FROM ps JOIN m ON ps.p_partkey = m.p_partkey
                            AND ps.cost_cents = m.min_cost_cents
                GROUP BY 1
            )
            SELECT sel.p_partkey, CAST(m.min_cost_cents AS BIGINT)
                       AS min_cost_cents,
                   sel.s_suppkey, eu.s_name, eu.n_name, eu.acctbal_cents
            FROM sel
            JOIN m ON m.p_partkey = sel.p_partkey
            JOIN eu ON eu.s_suppkey = sel.s_suppkey
        """,
    # exact tie-corrected ROC-AUC: doubled midrank = 2*rank + ties - 1,
    # doubled U1 = sum(dr | pos) - n_pos*(n_pos+1); the one float is
    # double(u2)/double(2*n_pos*n_neg) on both engines
    "event_click_auc": """
            WITH r AS (
                SELECT CASE WHEN event_type = 'click'
                            THEN 'pos' ELSE 'neg' END AS y,
                       CAST(floor(CAST(value AS DOUBLE) * 1000)
                            AS BIGINT) AS v
                FROM events
            ),
            rk AS (
                SELECT y,
                       2 * rank() OVER (ORDER BY v)
                           + count(*) OVER (PARTITION BY v) - 1 AS dr
                FROM r
            ),
            s AS (
                SELECT CAST(COALESCE(
                           sum(CASE WHEN y = 'pos' THEN dr END), 0)
                           AS BIGINT) AS r1x2,
                       CAST(count(*) FILTER (WHERE y = 'pos')
                            AS BIGINT) AS n_pos,
                       CAST(count(*) FILTER (WHERE y = 'neg')
                            AS BIGINT) AS n_neg
                FROM rk
            )
            SELECT n_pos, n_neg,
                   CAST(r1x2 - n_pos * (n_pos + 1) AS BIGINT) AS u2,
                   CAST(r1x2 - n_pos * (n_pos + 1) AS DOUBLE)
                       / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
            FROM s
            WHERE n_pos > 0 AND n_neg > 0
        """,
    # grouped 2-feature OLS by Cramer's rule over exact HUGEINT moments;
    # hour/dow by INTEGER epoch arithmetic (no date functions — byte
    # parity with the Ray kernel); floats = double(det_k)/double(det)
    "event_value_ols2": """
            WITH f AS (
                SELECT event_type,
                       (epoch_us(ts) // 3600000000) % 24 AS h,
                       (epoch_us(ts) // 86400000000 + 4) % 7 AS d,
                       CAST(floor(CAST(value AS DOUBLE) * 1000)
                            AS BIGINT) AS y
                FROM events
            ),
            m AS (
                SELECT event_type,
                       CAST(count(*) AS HUGEINT) AS n,
                       CAST(sum(h) AS HUGEINT) AS sh,
                       CAST(sum(d) AS HUGEINT) AS sd,
                       CAST(sum(h * h) AS HUGEINT) AS shh,
                       CAST(sum(h * d) AS HUGEINT) AS shd,
                       CAST(sum(d * d) AS HUGEINT) AS sdd,
                       CAST(sum(y) AS HUGEINT) AS sy,
                       CAST(sum(h * y) AS HUGEINT) AS shy,
                       CAST(sum(d * y) AS HUGEINT) AS sdy
                FROM f GROUP BY 1
            ),
            dets AS (
                SELECT event_type, n,
                       n * (shh * sdd - shd * shd)
                           - sh * (sh * sdd - shd * sd)
                           + sd * (sh * shd - shh * sd) AS det,
                       sy * (shh * sdd - shd * shd)
                           - sh * (shy * sdd - shd * sdy)
                           + sd * (shy * shd - shh * sdy) AS det0,
                       n * (shy * sdd - shd * sdy)
                           - sy * (sh * sdd - shd * sd)
                           + sd * (sh * sdy - shy * sd) AS det1,
                       n * (shh * sdy - shy * shd)
                           - sh * (sh * sdy - shy * sd)
                           + sy * (sh * shd - shh * sd) AS det2
                FROM m
            )
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) AS b0,
                   CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) AS b1,
                   CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) AS b2
            FROM dets WHERE det <> 0
        """,
    # Kaplan-Meier ingredients: entry = min signup, event = min purchase
    # >= entry, censored at the global max ts; n_risk = reverse
    # cumulative of per-duration totals; event days only
    "user_survival_km": """
            WITH hz AS (SELECT max(epoch_us(ts)) AS h FROM events),
            s AS (
                SELECT user_id, min(epoch_us(ts)) AS su
                FROM events WHERE event_type = 'signup' GROUP BY 1
            ),
            p AS (
                SELECT e.user_id, min(epoch_us(e.ts)) AS pu
                FROM events e JOIN s ON e.user_id = s.user_id
                WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.su
                GROUP BY 1
            ),
            u AS (
                SELECT s.user_id,
                       CASE WHEN p.pu IS NULL
                            THEN (hz.h - s.su) // 86400000000
                            ELSE (p.pu - s.su) // 86400000000 END AS dur,
                       CASE WHEN p.pu IS NULL THEN 0 ELSE 1 END AS ev
                FROM s LEFT JOIN p ON s.user_id = p.user_id, hz
            ),
            d AS (
                SELECT dur,
                       CAST(sum(ev) AS BIGINT) AS n_event,
                       CAST(count(*) AS BIGINT) AS n_total
                FROM u GROUP BY 1
            ),
            k AS (
                SELECT dur AS dur_day, n_event,
                       CAST(sum(n_total) OVER (ORDER BY dur DESC)
                            AS BIGINT) AS n_risk
                FROM d
            )
            SELECT dur_day, n_event, n_risk FROM k WHERE n_event > 0
        """,
    # calibration by score decile: quantile_disc edges (index rule
    # ceil(q*n)-1), bucket = count of edges strictly below v (list
    # lambda), exact counts + one int/int double division
    "value_decile_calibration": """
            WITH r AS (
                SELECT CAST(floor(CAST(value AS DOUBLE) * 1000)
                            AS BIGINT) AS v,
                       CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
                           AS y
                FROM events
            ),
            e AS (
                SELECT quantile_disc(v, [0.1, 0.2, 0.3, 0.4, 0.5,
                                         0.6, 0.7, 0.8, 0.9]) AS ed
                FROM r
            ),
            b AS (
                SELECT r.y,
                       CAST(list_sum(list_transform(
                           e.ed, x -> CASE WHEN r.v > x THEN 1 ELSE 0 END
                       )) AS BIGINT) AS bucket
                FROM r, e
            )
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS n_pos,
                   CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                       AS rate
            FROM b GROUP BY 1
        """,
    # grouped top-k distinct values: DENSE_RANK over value desc, exact
    # counts per surviving value
    "event_type_top_values": """
            WITH c AS (
                SELECT event_type,
                       CAST(floor(CAST(value AS DOUBLE) * 1000)
                            AS BIGINT) AS value_milli,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM events GROUP BY 1, 2
            ),
            r AS (
                SELECT event_type, value_milli, cnt,
                       CAST(dense_rank() OVER (
                           PARTITION BY event_type
                           ORDER BY value_milli DESC
                       ) AS BIGINT) AS rk
                FROM c
            )
            SELECT event_type, value_milli, cnt, rk FROM r WHERE rk <= 3
        """,
    # GROUPING SETS: four granularities in one statement; sentinels
    # ('ALL', -1) stand in for the aggregated-out keys (hour is 0..23
    # and types are non-null, so COALESCE is unambiguous)
    "events_grouping_sets": """
            WITH f AS (
                SELECT event_type,
                       (epoch_us(ts) // 3600000000) % 24 AS hr,
                       CAST(floor(CAST(value AS DOUBLE) * 1000)
                            AS BIGINT) AS v
                FROM events
            )
            SELECT COALESCE(event_type, 'ALL') AS event_type,
                   CAST(COALESCE(hr, -1) AS BIGINT) AS hr,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(v) AS BIGINT) AS sum_milli
            FROM f
            GROUP BY GROUPING SETS ((event_type, hr), (event_type),
                                    (hr), ())
        """,
    # quantile normalization: within-group rank (v, event_id order) ->
    # pooled order statistic at floor(r * n_pool / n_group)
    "events_quantile_normalize": """
            WITH f AS (
                SELECT event_id, event_type,
                       CAST(floor(CAST(value AS DOUBLE) * 1000)
                            AS BIGINT) AS v
                FROM events
            ),
            r AS (
                SELECT event_id,
                       row_number() OVER (
                           PARTITION BY event_type ORDER BY v, event_id
                       ) - 1 AS rk,
                       count(*) OVER (PARTITION BY event_type) AS ng
                FROM f
            ),
            pool AS (
                SELECT v,
                       row_number() OVER (ORDER BY v, event_id) - 1 AS j
                FROM f
            ),
            n AS (SELECT count(*) AS np FROM f),
            rr AS (
                -- materialize the join key so the planner hash-joins
                -- (joining on the inline expression nested-loops at 10M)
                SELECT r.event_id, (r.rk * n.np) // r.ng AS j
                FROM r CROSS JOIN n
            )
            SELECT rr.event_id,
                   CAST(pool.v AS BIGINT) AS normalized_milli
            FROM rr JOIN pool ON pool.j = rr.j
        """,
    # bitmask set-similarity degree: per doc, # others with word-set
    # jaccard >= 0.95; integer cross-multiplied test, bit_or/bit_count
    "similar_doc_degree": """
            WITH tok AS (
                SELECT DISTINCT doc_id, w FROM (
                    SELECT doc_id,
                           unnest(string_split(trim(text), ' ')) AS w
                    FROM documents
                )
            ),
            vocab AS (
                SELECT w, row_number() OVER (ORDER BY w) - 1 AS bit
                FROM (SELECT DISTINCT w FROM tok)
            ),
            mask AS (
                SELECT doc_id, bit_or(1::BIGINT << bit) AS m,
                       CAST(count(*) AS BIGINT) AS sz
                FROM tok JOIN vocab USING (w) GROUP BY 1
            )
            SELECT a.doc_id,
                   CAST(COALESCE(sum(CASE WHEN
                       bit_count(a.m & b.m) * 1000 >=
                       950 * (a.sz + b.sz - bit_count(a.m & b.m))
                       THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_similar
            FROM mask a JOIN mask b ON a.doc_id <> b.doc_id
            GROUP BY 1
        """,
    "events_k_anonymity": """
            SELECT event_type,
                   CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                   CAST(user_id % 100 AS BIGINT) AS cohort,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM events
            GROUP BY 1, 2, 3
            HAVING count(*) < 5
        """,
    "events_l_diversity": """
            WITH c AS (
                SELECT event_type,
                       CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                       CAST(user_id % 100 AS BIGINT) AS cohort,
                       CAST(floor(CAST(value AS DOUBLE) * 100)
                            AS BIGINT) // 2000 AS sens
                FROM events
            )
            SELECT event_type, day, cohort,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(DISTINCT sens) AS BIGINT) AS n_sens
            FROM c
            GROUP BY 1, 2, 3
            HAVING count(*) >= 3 AND count(DISTINCT sens) < 3
        """,
    "events_dp_type_counts": """
            WITH c AS (
                SELECT event_type,
                       CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                       CAST(count(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2
            ),
            r AS (
                SELECT event_type,
                       CAST(row_number() OVER (ORDER BY event_type) - 1
                            AS BIGINT) AS tr
                FROM (SELECT DISTINCT event_type FROM events)
            )
            SELECT c.event_type, day,
                   CAST(n + ([-8,-6,-5,-4,-4,-3,-3,-3,-3,-2,-2,-2,-2,-2,
                              -2,-1,-1,-1,-1,-1,-1,-1,-1,-1,0,0,0,0,0,0,
                              0,0,0,0,0,0,0,0,0,0,1,1,1,1,1,1,1,1,1,2,2,
                              2,2,2,2,3,3,3,3,4,4,5,6,8])[
                       (((day * 8 + tr) * 48271) % 2147483647) % 64 + 1]
                        AS BIGINT) AS noisy_count
            FROM c JOIN r USING (event_type)
        """,
    "doc_ngram_novelty": """
            WITH toks AS (
                SELECT doc_id, string_split(trim(text), ' ') AS tk
                FROM documents
            ),
            pos AS (
                SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i
                FROM toks
            ),
            sh AS (
                SELECT DISTINCT doc_id,
                       tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS g
                FROM pos
            ),
            firsts AS (SELECT g, min(doc_id) AS d0 FROM sh GROUP BY g),
            nf AS (
                SELECT d0 AS doc_id, CAST(count(*) AS BIGINT) AS n_first
                FROM firsts GROUP BY 1
            ),
            ng AS (
                SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
                FROM sh GROUP BY 1
            )
            SELECT ng.doc_id, n_grams,
                   CAST(COALESCE(n_first, 0) AS BIGINT) AS n_first,
                   COALESCE(n_first, 0) * 1.0 / n_grams AS novelty
            FROM ng LEFT JOIN nf USING (doc_id)
        """,
    "user_event_regex": """
            WITH s AS (
                SELECT user_id,
                       string_agg(substr(event_type, 1, 1), ''
                                  ORDER BY ts, event_id) AS seq
                FROM events GROUP BY 1
            )
            SELECT user_id,
                   CAST(length(seq) AS BIGINT) AS seq_len,
                   CAST(CASE WHEN regexp_matches(seq, 'sc+p')
                        THEN 1 ELSE 0 END AS BIGINT) AS matched
            FROM s
        """,
    "doc_graph_triangles": """
            WITH
            nn AS (SELECT count(*) AS n FROM documents),
            e AS (
                SELECT doc_id + 1 AS u, (doc_id + 1) * 2 AS v
                FROM documents, nn WHERE (doc_id + 1) * 2 <= nn.n
                UNION
                SELECT doc_id + 1, (doc_id + 1) * 2 + 1
                FROM documents, nn WHERE (doc_id + 1) * 2 + 1 <= nn.n
                UNION
                SELECT doc_id + 1, doc_id + 2 + (n_chars % 64)
                FROM documents, nn
                WHERE doc_id + 2 + (n_chars % 64) <= nn.n
            ),
            d AS (
                SELECT node, CAST(count(*) AS BIGINT) AS dg
                FROM (SELECT u AS node FROM e
                      UNION ALL SELECT v AS node FROM e)
                GROUP BY 1
            )
            SELECT
                (SELECT CAST(count(*) AS BIGINT)
                 FROM e a JOIN e b ON b.u = a.v
                          JOIN e c ON c.u = a.u AND c.v = b.v)
                    AS n_triangles,
                (SELECT CAST(COALESCE(SUM(dg * (dg - 1) // 2), 0) AS BIGINT)
                 FROM d) AS n_wedges
        """,
    # sorted-neighborhood blocking: rank by a 16-char text prefix (the
    # documents corpus is ASCII, so char == byte semantics match the Ray
    # side's byte prefix), pair ranks within the w=3 window
    "sorted_neighborhood_pairs": """
            WITH s AS (
                SELECT doc_id,
                       row_number() OVER (
                           ORDER BY substr(text, 1, 16), doc_id
                       ) - 1 AS rn
                FROM documents
            )
            SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                   CAST(b.rn - a.rn AS BIGINT) AS dist
            FROM s a JOIN s b ON b.rn - a.rn BETWEEN 1 AND 3
        """,
    # time-weighted mean: the EARLIER event's (floor-milli) value carries
    # until the next event; (ts, event_id) pins equal timestamps to one
    # order on both engines; single-event users have no gap (NULL lead)
    "user_time_weighted_value": """
            WITH s AS (
                SELECT user_id,
                       CAST(floor(value * 1000.0) AS BIGINT) AS milli,
                       epoch_us(ts) AS t,
                       lead(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS nxt
                FROM events
            )
            SELECT user_id,
                   CAST(sum(milli * (nxt - t)) AS BIGINT) AS num_milli_us,
                   CAST(sum(nxt - t) AS BIGINT) AS den_us,
                   CAST(CAST(sum(milli * (nxt - t)) AS BIGINT) AS DOUBLE)
                       / CAST(CAST(sum(nxt - t) AS BIGINT) AS DOUBLE)
                       AS twa_milli
            FROM s
            WHERE nxt IS NOT NULL
            GROUP BY user_id
        """,
    # CUSUM mean-shift screen with the division cleared: dev_k =
    # n*cumsum_k - k*total over the daily milli series, argmax |dev|,
    # ties to the earliest day — every quantity an exact BIGINT
    "events_cusum_changepoint": """
            WITH d AS (
                SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_idx,
                       CAST(sum(CAST(floor(value * 1000.0) AS BIGINT))
                            AS BIGINT) AS milli
                FROM events
                GROUP BY 1
            ), c AS (
                SELECT day_idx,
                       SUM(milli) OVER (ORDER BY day_idx) AS cum,
                       row_number() OVER (ORDER BY day_idx) AS k,
                       COUNT(*) OVER () AS n,
                       SUM(milli) OVER () AS total
                FROM d
            )
            SELECT CAST(day_idx AS BIGINT) AS day_idx,
                   CAST(n * cum - k * total AS BIGINT) AS dev,
                   CAST(n AS BIGINT) AS n_days,
                   CAST(total AS BIGINT) AS total_milli
            FROM c
            ORDER BY abs(n * cum - k * total) DESC, day_idx
            LIMIT 1
        """,
    # Fellegi-Sunter sufficient statistics: per-field agreement bits
    # over id-window candidate pairs, LSB order lang/source/len/prefix
    # (docs are ASCII so char substr == the Ray side's char prefix)
    "linkage_agreement_patterns": """
            WITH p AS (
                SELECT
                    (CASE WHEN a.lang = b.lang THEN 1 ELSE 0 END)
                    + 2 * (CASE WHEN a.source = b.source
                           THEN 1 ELSE 0 END)
                    + 4 * (CASE WHEN a.n_chars // 64 = b.n_chars // 64
                           THEN 1 ELSE 0 END)
                    + 8 * (CASE WHEN substr(a.text, 1, 8)
                                    = substr(b.text, 1, 8)
                           THEN 1 ELSE 0 END) AS pattern
                FROM documents a
                JOIN documents b ON b.doc_id - a.doc_id BETWEEN 1 AND 3
            )
            SELECT CAST(pattern AS BIGINT) AS pattern,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM p
            GROUP BY 1
        """,
    # exact two-sample KS: ks_num = max |cum_a*n_b - cum_b*n_a| over the
    # union value grid (all BIGINT); ks_d is the one float both engines
    # derive identically from the same exact ints
    "source_length_ks": """
            WITH c AS (SELECT source, n_chars v, count(*) cnt
                       FROM documents GROUP BY 1, 2),
                 srcs AS (SELECT source, sum(cnt) n FROM c GROUP BY 1),
                 vals AS (SELECT DISTINCT v FROM c),
                 grid AS (SELECT s.source, s.n, vals.v
                          FROM srcs s CROSS JOIN vals),
                 cums AS (
                   SELECT g.source, g.n, g.v,
                          sum(COALESCE(c.cnt, 0)) OVER (
                              PARTITION BY g.source ORDER BY g.v) AS cum
                   FROM grid g
                   LEFT JOIN c ON c.source = g.source AND c.v = g.v
                 )
            SELECT source_a, source_b, n_a, n_b, ks_num,
                   CAST(ks_num AS DOUBLE) / (n_a * n_b) AS ks_d
            FROM (
              SELECT a.source AS source_a, b.source AS source_b,
                     CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
                     CAST(max(abs(a.cum * b.n - b.cum * a.n)) AS BIGINT)
                         AS ks_num
              FROM cums a JOIN cums b ON a.v = b.v AND a.source < b.source
              GROUP BY 1, 2, 3, 4
            )
            ORDER BY 1, 2
        """,
    # exact Mann-Whitney U with DOUBLED midranks (2*below + ties + 1) so
    # tie-corrected rank sums stay integer; u2_a + u2_b == 2*n_a*n_b
    "events_mannwhitney": """
            WITH e AS (SELECT event_type t,
                              CAST(floor(CAST(value AS DOUBLE) * 1000)
                                   AS BIGINT) v
                       FROM events),
                 c AS (SELECT t, v, count(*) cnt FROM e GROUP BY 1, 2),
                 n AS (SELECT t, sum(cnt) n FROM c GROUP BY 1),
                 vals AS (SELECT DISTINCT v FROM c),
                 grid AS (SELECT n.t, n.n, vals.v FROM n CROSS JOIN vals),
                 cums AS (
                   SELECT g.t, g.n, g.v, COALESCE(c.cnt, 0) AS cnt,
                          sum(COALESCE(c.cnt, 0)) OVER (
                              PARTITION BY g.t ORDER BY g.v) AS cum
                   FROM grid g LEFT JOIN c ON c.t = g.t AND c.v = g.v
                 ),
                 agg AS (
                   SELECT a.t AS type_a, b.t AS type_b,
                          CAST(a.n AS BIGINT) AS n_a,
                          CAST(b.n AS BIGINT) AS n_b,
                          CAST(sum(a.cnt * (2 * ((a.cum - a.cnt)
                                                 + (b.cum - b.cnt))
                                            + (a.cnt + b.cnt) + 1))
                               AS BIGINT) AS r1x2
                   FROM cums a JOIN cums b ON a.v = b.v AND a.t < b.t
                   GROUP BY 1, 2, 3, 4
                 )
            SELECT type_a, type_b, n_a, n_b,
                   2 * n_a * n_b + n_a * (n_a + 1) - r1x2 AS u2_a,
                   2 * n_a * n_b
                       - (2 * n_a * n_b + n_a * (n_a + 1) - r1x2) AS u2_b
            FROM agg
            ORDER BY 1, 2
        """,
    }
