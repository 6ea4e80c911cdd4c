"""Query plan registry — the engine's correctness surface.

Importing this package registers every query module. ``REGISTRY`` maps
query name → QueryDef(spark_fn, oracle_sql).
"""

from wally_spark.plans.registry import REGISTRY, QueryDef, register  # noqa: F401

# Import for side effect: each module registers its queries.
from wally_spark.plans import tpch  # noqa: F401,E402
from wally_spark.plans import tpch_ext  # noqa: F401,E402
from wally_spark.plans import events  # noqa: F401,E402
from wally_spark.plans import apps  # noqa: F401,E402
from wally_spark.plans import text  # noqa: F401,E402
from wally_spark.plans import dedup  # noqa: F401,E402
from wally_spark.plans import similarity  # noqa: F401,E402
from wally_spark.plans import multimodal  # noqa: F401,E402
from wally_spark.plans import analytics  # noqa: F401,E402
from wally_spark.plans import bucketed  # noqa: F401,E402
from wally_spark.plans import embeddings  # noqa: F401,E402
from wally_spark.plans import sampling  # noqa: F401,E402
from wally_spark.plans import curation  # noqa: F401,E402

# Window placement is handled by the _DRIVER_GREEN/_NO_ORACLE reorder
# below (module order only breaks ties within each block), so new
# modules may register anywhere; newest-last keeps diffs tidy.
from wally_spark.plans import quality  # noqa: F401,E402
from wally_spark.plans import analytics_ext  # noqa: F401,E402
from wally_spark.plans import timeseries  # noqa: F401,E402
from wally_spark.plans import search  # noqa: F401,E402
from wally_spark.plans import sequence  # noqa: F401,E402
from wally_spark.plans import web  # noqa: F401,E402
from wally_spark.plans import behavior  # noqa: F401,E402
from wally_spark.plans import llm_ext  # noqa: F401,E402
from wally_spark.plans import unigram  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Driver-window ordering.
#
# The correctness driver checks exactly the FIRST 50 entries of
# ``queries()`` in registration order. With >50 registered queries, the
# only way every query eventually earns a driver-green row is to rotate
# queries needing verification to the front. ``_DRIVER_GREEN`` lists
# every name with a passing driver row (rows+schema+hash all true) as
# of its LAST code change; ``_CHANGED_THIS_ROUND`` strips that parked
# status from any query whose implementation changed in the current
# round, so the driver re-checks the new plan instead of trusting a
# stale green row (r5 verdict, "What's missing" #2). ``_NO_ORACLE``
# queries (approximate ops verified by bounded local gates instead of
# a DuckDB oracle) can never produce a green row — they sort LAST so
# they never burn a window slot. Relative order within each group is
# the module registration order above (stable, deterministic).
# ---------------------------------------------------------------------------

_DRIVER_GREEN = frozenset(
    {
        "ab_test_report", "ann_bruteforce", "ann_index_probe", "ann_ivf",
        "ann_lsh", "ann_pq", "ann_quantized", "ann_recall_report",
        "app_alerts_local_agg", "app_alerts_stateful",
        "app_alerts_stateless", "app_alerts_windowed", "app_alphabet",
        "app_alphabet_partitioned", "app_celsius", "app_celsius_connectors",
        "app_market_spread", "app_multi_worker_forwarding",
        "app_passthrough", "app_word_count", "app_word_count_collect",
        "asof_next_view", "asof_purchase_view", "asof_purchase_view_1h",
        "attribution_last_touch", "basket_rules", "blocklist_terms_filter",
        "bloom_dedup_audit", "bm25_rank", "bpe_decode_check", "bpe_encode",
        "bpe_encode_ids", "bpe_merge_pairs", "bpe_merge_stability",
        "bpe_merges_r4", "brand_price_dispersion", "brand_return_rate",
        "chunk_overlap", "cohort_revenue_ltv", "contrastive_pairs",
        "corpus_mix_report", "corpus_shard_manifest",
        "cross_source_dup_report", "cube_pricing",
        "cumulative_revenue_share", "curation_pipeline",
        "curriculum_schedule", "customer_first_last_orders",
        "daily_value_percentiles", "decontaminate_embedding",
        "decontaminate_holdout", "decontaminate_minhash",
        "dedup_cluster_size_hist", "dedup_clusters", "dedup_edit_verified",
        "dedup_embedding", "dedup_embedding_lsh", "dedup_exact",
        "dedup_keep_best", "dedup_lines", "dedup_minhash",
        "dedup_ngram_jaccard", "dedup_normalized", "dedup_simhash",
        "dedup_simhash_pairs", "dedup_substring", "dedup_winnowing",
        "discount_band_report", "distinct_users_exact", "doc_nb_classifier",
        "docs_length_band", "docs_token_histogram", "docs_vocab_simpson",
        "dq_null_profile", "dq_referential_audit", "dsir_importance",
        "dup_embedding_consistency", "dup_rate_report",
        "embedding_centroids", "embedding_cluster_balance",
        "embedding_dim_stats", "embedding_kcenter", "embedding_kmeans",
        "embedding_knn_graph", "embedding_matryoshka_recall",
        "embedding_norm_report", "embedding_outliers", "embedding_pair_hist",
        "embedding_pca_power", "embedding_random_projection",
        "embedding_silhouette", "event_path_trigrams",
        "event_sessionize_stats", "event_transitions",
        "event_value_hour_corr", "event_volume_trend", "events_anomaly_mad",
        "events_autocorr", "events_benford", "events_cohort_retention",
        "events_cusum_changepoint", "events_decode_audit",
        "events_dedup_hourly", "events_ewma", "events_funnel",
        "events_json_extract", "events_markov_stationary", "events_ohlc",
        "events_ols_multi", "events_peak_concurrency", "events_rate_limit",
        "events_seasonality", "events_value_ranks", "events_window_funnel",
        "fact_dq_audit", "feature_hash_audit", "gap_fill_locf",
        "gopher_rules", "graph_clustering_coeff",
        "graph_degree_assortativity", "graph_kcore", "graph_label_prop",
        "graph_link_prediction", "graph_pagerank", "graph_triangle_count",
        "heavy_hitters_report", "host_curation_report", "hypertable_rollup",
        "interarrival_stats", "join_skew_audit", "knn_label_vote",
        "lang_source_quota", "langid_agreement", "langid_confusion",
        "late_arrival_report", "line_dup_catalog",
        "lineitem_charges_unpivot", "lsh_recall_measured",
        "lsh_tuning_curve", "minhash_bbit_audit", "minhash_containment",
        "minhash_estimate_audit", "mm_binary_dup", "mm_byte_stats",
        "mm_frame_sample", "mm_gif_anim_stats", "mm_image_header",
        "mm_image_meta", "mm_jpeg_segments", "mm_mp4_boxes",
        "mm_pcm_silence", "mm_pcm_stats", "mm_phash_dup", "mm_png_chunks",
        "mm_tar_members", "mm_thumbnail", "mm_wav_header", "mm_zip_entries",
        "nation_trade_matrix", "nb_calibration", "ngram_coverage",
        "ntile_order_quartiles", "oov_rate_by_source",
        "open_order_lines_daily", "orders_aging_bands",
        "orders_grouping_sets", "orders_value_percentile_bands",
        "orders_yoy_growth", "pack_attention_boundaries",
        "pack_bestfit_report", "pack_chunks", "pack_contamination_report",
        "part_affinity_jaccard", "part_cooccurrence", "pipeline_merge",
        "pivot_user_event_totals", "pool_filter_report",
        "price_index_laspeyres", "price_quantity_elasticity",
        "priority_sla_report", "q10_returned_items", "q11_important_parts",
        "q12_priority_class", "q13_customer_distribution",
        "q14_promo_effect", "q15_top_supplier", "q16_parts_supplier",
        "q17_small_quantity", "q18_bucketed", "q18_large_customers",
        "q19_discounted_revenue", "q1_pricing_summary",
        "q20_significant_suppliers", "q21_suppliers_kept_waiting",
        "q22_global_sales_opportunity", "q2_best_supplier", "q3_bucketed",
        "q3_shipping_priority", "q4_order_priority", "q5_local_supplier",
        "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
        "q9_product_profit", "quality_dup_contingency", "quality_rule_sweep",
        "quantiles_by_type", "quantiles_exact_check",
        "range_join_views_before_purchase", "repetition_mixing_schedule",
        "resample_1h", "revenue_decile_gains", "revenue_dod_delta",
        "rolling_7d_revenue", "rollup_orders", "running_total",
        "salted_event_totals", "sample_kfold_assign", "sample_pps",
        "sample_reservoir", "sample_stratified", "sample_temperature",
        "schema_drift_report", "semantic_dedup", "session_conversion_lag",
        "session_entry_exit", "setops_viewer_purchasers",
        "simhash_recall_audit", "sliding_distinct_users",
        "source_length_gini", "source_token_kl", "span_corruption_manifest",
        "split_train_holdout", "supplier_concentration_hhi",
        "supplier_latency_report", "supplier_redundancy", "text_boilerplate",
        "text_fingerprint", "text_langid", "text_langid_margin",
        "text_langid_ngram", "text_lm_bigram", "text_lm_kneser_ney",
        "text_lm_perplexity", "text_ngram_novelty", "text_pii_scrub",
        "text_quality", "text_readability", "text_repetition",
        "text_script_mix", "text_sentence_stats", "text_tokens",
        "text_word_entropy", "tfidf_top_terms", "time_weighted_avg",
        "token_budget_allocation", "token_pmi", "token_source_mi",
        "tokenizer_fertility", "tokenizer_vocab_growth", "topk_per_key",
        "url_blocklist", "url_canonical_dedup", "user_activity_gaps",
        "user_activity_gini", "user_bot_score", "user_burst_minutes",
        "user_churn_features", "user_event_entropy",
        "user_purchase_intervals", "user_rfm_segments",
        "user_survival_curve", "value_histogram", "value_outliers",
        "value_winsorized", "vocab_bigrams", "vocab_coverage_curve",
        "win_count", "win_session", "win_sliding", "win_tumbling",
        "zipf_slope",
    }
)

# Queries whose implementation (or a shared operator they call) changed
# in the CURRENT round: their green rows describe the old plan, so they
# re-enter the driver window. Refresh this set each round.
_CHANGED_THIS_ROUND: frozenset = frozenset(
    {
        # r14 (optimization round 2): graph edge pre-partition default
        # reverted to OFF (VERDICT r13 #1 — the r13 claim was falsified;
        # the pin-time repartition was a pure added exchange). Plans of
        # the five consumer lanes change (repartition node gone).
        "graph_pagerank",
        "graph_label_prop",
        "dedup_clusters",
        "dedup_keep_best",
        "dedup_cluster_size_hist",
        # r14: banded-Levenshtein equality short-circuit (editforest
        # .edit_distance; levenshtein(x,x,k)==0 by construction)
        "dedup_edit_verified",
        # r14: NB+PPL model builds share one sampled-corpus word
        # aggregate inside the report (bit-identical models); the
        # standalone lanes' plans are unchanged but re-verify anyway
        # (the factoring rule)
        "pool_filter_report",
        "text_lm_perplexity",
        "doc_nb_classifier",
        # r14: minhash_band_candidates default reverted to the
        # pair-keyed groupBy spelling (VERDICT r13 #3 adjudicated at
        # sf0.1 + sf1: pair-keyed wins or ties everywhere; knob
        # spark.wally.minhash.fsb=true keeps the r13 arm measurable).
        # Identical multiset — every consumer lane re-verified.
        "dedup_minhash",
        "dedup_ngram_jaccard",
        "dup_rate_report",
        "cross_source_dup_report",
        "minhash_estimate_audit",
        "minhash_bbit_audit",
        "minhash_containment",
        "curation_pipeline",
        "repetition_mixing_schedule",
        "decontaminate_minhash",
        "lsh_tuning_curve",
        "lsh_recall_measured",
        "bloom_dedup_audit",
        "host_curation_report",
        # r14: shuffle-top pins (sigs/cands/fingerprint relations) now
        # lazy-localCheckpoint (pin_shuffle_top) — same plan, same
        # blocks, one fewer eager job per pin; re-verify consumers.
        "dedup_winnowing",
        "dedup_simhash",
        "dedup_simhash_pairs",
        "simhash_recall_audit",
    }
)

# Approximate operators with bounded local gates instead of oracle SQL
# (the driver records them as ``err: no_oracle`` forever) — park them
# behind the green block so they never occupy a window slot.
# (embedding_kmeans and ann_quantized left this set in r5: both are
# deterministic arithmetic that mirrors exactly in SQL — only the two
# sketch-based ops remain genuinely oracle-less.)
_NO_ORACLE = frozenset(
    {
        "approx_distinct_users", "approx_quantiles_by_type",
    }
)


def _reorder_for_driver_window() -> None:
    green = (_DRIVER_GREEN - _CHANGED_THIS_ROUND) - _NO_ORACLE
    front = {
        n: q for n, q in REGISTRY.items()
        if n not in green and n not in _NO_ORACLE
    }
    mid = {n: q for n, q in REGISTRY.items() if n in green}
    back = {n: q for n, q in REGISTRY.items() if n in _NO_ORACLE}
    REGISTRY.clear()
    REGISTRY.update(front)
    REGISTRY.update(mid)
    REGISTRY.update(back)


_reorder_for_driver_window()
