"""Driver-style parity: every oracle-checked query must match DuckDB on the
same parquet tables — row count, column names, and order-insensitive values
(the driver's correctness gate, run here at sf0.001 for speed; the driver
runs sf0.01)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # int-like floats -> int64 for cross-engine dtype stability
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


ORACLE_QUERIES = [
    "user_event_diversity",
    "tpch_q3_top_orders",
    "term_postings",
    "tpch_q13_custdist",
    "tpch_q4_late_shipments",
    "user_longest_streak",
    "user_interevent_median",
    "event_value_deciles",
    "segment_acctbal_gini",
    "customer_rfm",
    "event_nearest_order",
    "documents_profile_drift",
    "user_out_of_order_events",
    "events_daily_autocorr",
    "source_mixture_weights",
    "dup_cluster_histogram",
    "events_anomaly_hours",
    "order_fulfillment_lag",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned",
    "tpch_q14_promo_share",
    "part_cheapest_supplier",
    "lang_type_token_ratio",
    "rolling_active_users",
    "click_to_purchase_median",
    "user_value_pareto",
    "source_dup_rate",
    "stratified_fixed_k_sample",
    "lineitem_rate_grid",
    "orders_weekday_seasonality",
    "tpch_q7_nation_volume",
    "tpch_q21_waiting_suppliers",
    "tpch_q8_market_share",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_bracket_revenue",
    "tpch_q18_large_orders",
    "tpch_q16_supplier_counts",
    "tpch_q22_dormant_customers",
    "tpch_q9_product_profit",
    "tpch_q11_important_parts",
    "orders_totalprice_recon",
    "orders_benford",
    "event_type_user_overlap",
    "lineitem_corr_matrix",
    "documents_expectations",
    "lang_source_contingency",
    "events_type_mad",
    "event_trigrams",
    "orders_mom_growth",
    "customer_cohort_orders",
    "part_major_suppliers",
    "tpch_q12_shipping_lag",
    "user_type_runs",
    "event_value_zscore",
    "doc_graph_bfs_levels",
    "doc_graph_sssp",
    "tpch_q2_min_cost_supplier",
    "event_click_auc",
    "event_value_ols2",
    "user_survival_km",
    "value_decile_calibration",
    "event_type_top_values",
    "events_grouping_sets",
    "events_quantile_normalize",
    "similar_doc_degree",
    "doc_graph_triangles",
    "sorted_neighborhood_pairs",
    "events_since_signup",
    "event_type_octiles",
    "part_association_rules",
    "documents_checksum",
    "part_pair_counts",
    "user_behavior_profiles",
    "doc_chain_ranks",
    "event_value_winsorized",
    "doc_chunk_windows",
    "order_price_allocation",
    "user_busy_intervals",
    "event_transitions",
    "user_retention_daily",
    "user_value_hourly_ffill",
    "lang_chain_components",
    "order_skyline",
    "name_typo_pairs",
    "user_top_event",
    "doc_dir_rollup",
    "top_collocations",
    "returnflag_weighted_median",
    "exact_dedup",
    "canonicalize_basic",
    "token_count",
    "quality_stats",
    "lang_count",
    "ngram_shingles",
    "word_jaccard_pairs",
    "edit_distance_pairs",
    "doc_token_positions",
    "boilerplate_ngrams",
    "quality_filter",
    "customer_order_ranks",
    "customer_order_frames",
    "event_value_histogram",
    "orders_by_month",
    "props_key_stats",
    "redact_docs",
    "users_with_both",
    "user_event_pivot",
    "users_without",
    "lineitem_agg",
    "lineitem_q1_full",
    "events_hourly",
    "ann_topk",
    "top_events_by_value",
    "embedding_dups",
    "distinct_users",
    "mktsegment_order_stats",
    "supplier_nation_agg",
    "bpe_token_count",
    "user_sessions",
    "exact_copy_coclustering",
    "event_order_asof",
    "click_attribution",
    "events_sliding",
    "tfidf_top_terms",
    "hash_sample",
    "lang_top_docs",
    "order_customer_nation",
    "customers_without_orders",
    "customers_without_orders_bloom",
    "nation_customer_names",
    "all_party_names",
    "customers_with_big_order",
    "priority_price_quantiles",
    "repetition_stats",
    "lineitem_rollup",
    "orders_cube",
    "contamination_flags",
    "contamination_ngram",
    "stratified_sample",
    "orders_above_customer_avg",
    "tpch_q5_local_revenue",
    "export_training_shards",
    "doc_rarity_score",
    "label_centroids",
    "user_funnel",
    "documents_upsert",
    "brand_type_margin",
    "event_debounce",
    "events_value_p99_outliers",
    "events_value_mad",
    "embedding_quantize_int8",
    "user_order_full_outer",
    "documents_snapshot_diff",
    "user_activity_histogram",
    "documents_profile",
    "priority_price_iqr",
    "documents_scd2",
    "embedding_covariance",
    "source_top_lang",
    "event_type_distinct_users",
    "user_value_trend",
    "segment_revenue_share",
    "events_zorder",
    "cosine_threshold_calibration",
    "dedup_eval_prefix_vs_exact",
    "attribution_pairs",
    "global_event_ranks",
    "lineitem_unpivot",
    "similar_doc_pairs",
    "events_type_median_exact",
    "weighted_doc_sample",
    "source_ngram_overlap",
    "pack_sequences",
    "scrub_boilerplate_tokens",
    "eval_overlap_pairs",
    "similar_docs_topk",
    "user_time_weighted_value",
    "events_cusum_changepoint",
    "linkage_agreement_patterns",
    "source_length_ks",
    "events_mannwhitney",
    "events_k_anonymity",
    "events_l_diversity",
    "events_dp_type_counts",
    "doc_ngram_novelty",
    "user_event_regex",
]


def test_parity_lists_cover_registry():
    """Sync guard: every oracle_sql row is parity-tested here, and every
    rows-only registry row is either in ROWS_ONLY or in the documented
    exclusion set (covered by a dedicated slow test elsewhere)."""
    import __ray_entry__ as entrymod

    oracle = set(entrymod.oracle_sql())
    registry = set(entrymod.queries())
    assert oracle <= registry
    assert set(ORACLE_QUERIES) == oracle, (
        sorted(set(ORACLE_QUERIES) ^ oracle)
    )
    # the taggers train multi-epoch — exercised in test_tagger.py
    excluded = {"license_tagger", "license_tagger_crf"}
    assert set(ROWS_ONLY) | excluded == registry - oracle, (
        sorted((set(ROWS_ONLY) | excluded) ^ (registry - oracle))
    )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(ray_session, oracle_con, name):
    import __ray_entry__ as entrymod

    ray_df = _normalize(_to_pandas(entrymod.queries()[name](SF_DIR)))
    sql_df = _normalize(oracle_con.sql(entrymod.oracle_sql()[name]).df())

    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} vs {len(sql_df)} rows"
    for c in ray_df.columns:
        a, b = ray_df[c].to_numpy(), sql_df[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            import numpy as np

            assert np.allclose(a.astype(float), b.astype(float), atol=1e-9), (
                f"{name}.{c} float mismatch"
            )
        else:
            assert (a.astype(str) == b.astype(str)).all(), f"{name}.{c} mismatch"


ROWS_ONLY = [
    "bpe_fertility_by_lang",
    "tiered_dedup_report",
    "near_dupe_clusters",
    "cdc_chunk_dups",
    "chunk_containment_pairs",
    "minhash_lsh_edges",
    "near_dupe_hash_keys",
    "simhash64",
    "langid",
    "fingerprint_counts",
    "substring_spans",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "ann_topk_ivf_sq8",
    "mmr_topk",
    "cluster_size_topk",
    "simhash_dup_pairs",
    "hot_buckets",
    "dedup_report",
    "near_dupe_clusters_with_spans",
    "expand_multi_forms",
    "approx_distinct_users_hll",
    "heavy_hitter_tokens",
    "user_event_count_cms",
    "prepare_training_corpus",
    "incremental_dedup",
    "approx_price_quantiles",
    "media_feature_extract",
    "media_frame_sample",
    "train_code_lang",
    "near_dupe_pagerank",
    "doc_lm_perplexity",
    "embedding_pca2",
    "bpe_train_merges",
    "bpe_compression",
    "refresh_dedup_cycle",
    "user_value_p50_sketch",
    "embedding_dups_bucketed",
    "semantic_dedup",
    "doc_graph_mst",
    "doc_graph_kcore",
    "linkage_fs_em",
    "doc_graph_matching",
    "doc_graph_communities",
    "doc_graph_wl_colors",
    "doc_graph_hits",
    "doc_graph_betweenness",
    "coverage_select_docs",
    "events_bootstrap_ci",
    "events_isotonic_daily",
]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, name):
    import __ray_entry__ as entrymod

    df = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert len(df) >= 0
    assert len(df.columns) >= 2


def test_entry_smoke(ray_session):
    import __ray_entry__ as entrymod

    df = _to_pandas(entrymod.entry())
    assert len(df) > 0
    assert "cluster_id" in df.columns
