"""Driver-gate mirror: run a fast subset of ``queries()`` at sf0.001 and
compare row-count / schema / values against ``oracle_sql()`` via DuckDB —
the exact canonicalization the driver uses (columns sorted by name,
order-insensitive rows).

The subset covers the most drift-prone surfaces (the ER family, one
query per dedup family, the join/agg shapes); the two queries whose
DuckDB oracles are themselves ~25s (er_profiles string_agg,
ngram_jaccard all-pairs) stay in ``scripts/check_queries.py``, run
manually and by the per-round driver gate at sf0.01.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from check_queries import canon, compare_frames, oracle_con, to_pandas  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "lineitem_agg",
    "segment_revenue",
    "top_orders",
    "hourly_user_events",
    "exact_dedup_docs",
    "doc_dedup_keep_best",
    "exact_dedup_incremental",
    "minhash_dedup_incremental",
    "ann_rrf_top10",
    "cust_supp_communities",
    "customer_cdc_merged",
    "doc_substring_dedup",
    "doc_token_counts",
    "doc_repetition",
    "doc_line_dedup",
    "doc_quality",
    "doc_clean",
    "doc_fingerprints",
    "doc_pii_scrub",
    "doc_top_terms",
    "event_sessions",
    "event_zscores",
    "events_jsonl_stats",
    "events_jsonl_parsed",
    "events_partitioned_stats",
    "events_range_partition_stats",
    "events_schema_evolution",
    "customer_csv_stats",
    "doc_hash_split",
    "source_char_budget_sample",
    "doc_lm_score",
    "doc_collocations",
    "doc_stratified_sample",
    "doc_pack",
    "doc_pack_texts",
    "doc_shuffle_index",
    "doc_weighted_sample",
    "cust_no_orders",
    "cust_running_revenue",
    "semdedup_pairs",
    "semdedup_keep",
    "source_mixture",
    "mixture_resampled",
    "events_above_median",
    "event_type_approx_users",
    "event_type_hll_users",
    "event_type_cm_counts",
    "hourly_approx_users",
    "event_value_quantiles_sketch",
    "gram_overlap_est",
    "doc_contamination_bloom",
    "doc_chunks",
    "embedding_quantized",
    "embedding_pca2",
    "bpe_learned_merges",
    "doc_token_ids",
    "event_value_pct_rank",
    "event_value_dense_rank",
    "event_global_rank",
    "event_gaps",
    "event_value_ntile",
    "event_rollup",
    "events_profile_numeric",
    "events_profile_strings",
    "event_value_histogram",
    "event_value_equidepth",
    "late_events",
    "user_first_last_event",
    "purchase_click_window",
    "event_value_imputed",
    "event_feature_hash",
    "event_type_share",
    "event_value_ks",
    "event_type_gini",
    "purchase_value_ecdf",
    "sliding_user_counts",
    "er_dialogue_stats",
    "er_sft_pairs",
    "er_conv_dedup",
    "er_response_latency",
    "er_email_consistency",
    "global_revenue_running",
    "user_funnel",
    "new_users_per_hour",
    "user_retention",
    "user_value_window_sum",
    "event_type_jaccard",
    "event_value_winsorized",
    "doc_greedy_cover",
    "hourly_top_types",
    "event_value_outliers",
    "hourly_distinct_users",
    "user_event_entropy",
    "user_top_event_type",
    "embedding_projection",
    "embedding_kmeans_cells",
    "corpus_diff",
    "user_event_pivot",
    "semdedup_clusters",
    "cust_with_orders",
    "nation_revenue_q5",
    "embedding_gram",
    "image_ahash",
    "video_frames",
    "video_motion",
    "video_mp4_samples",
    "simhash_dup_pairs_docs",
    "doc_cosine_pairs",
    "ann_top10",
    "ann_ivf_appended",
    "embedding_dup_pairs",
    "embedding_norms",
    "label_centroids",
    "er_pairs",
    "er_pairs_exact_keys",
    "er_classified",
    "er_name_cosine",
    "er_clusters",
    "er_eval_metrics",
    "event_hour_value_ols",
    "supplier_pagerank",
    "cust_supp_kcore",
    "part_copurchase_triangles",
    "image_ahash_dups",
    "image_dup_clusters",
    "user_value_ewma",
    "event_cube",
    "event_type_hour_mi",
    "doc_contrastive_negatives",
]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} not present")
    import __ray_entry__

    # er_* oracle SQL must read the sf0.001-sized corpus (paths are
    # keyed by n_entities so a concurrent sf0.01 run can't clobber ours)
    os.environ["GRAFT_ORACLE_N"] = str(__ray_entry__._corpus_entities(SF_DIR))
    os.environ["GRAFT_ORACLE_SF"] = SF_DIR
    return __ray_entry__


@pytest.fixture(scope="module")
def duck(entry_mod):
    con = oracle_con(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(entry_mod, duck, name):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert name in qs, f"{name} missing from queries()"
    res = canon(to_pandas(qs[name](SF_DIR)))
    if name not in oracles:
        pytest.fail(f"{name} has no oracle_sql entry")
    exp = canon(duck.execute(oracles[name]).fetchdf())
    errs = compare_frames(name, res, exp)
    assert not errs, "; ".join(errs)
