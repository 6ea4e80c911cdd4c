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
        # CORRECTNESS_r01/r02
        "q1_pricing_summary", "q3_shipping_priority", "q4_order_priority",
        "q5_local_supplier", "q6_forecast_revenue", "q7_volume_shipping",
        "q10_returned_items", "q12_priority_class", "q14_promo_effect",
        "q16_parts_supplier", "q18_large_customers", "q19_discounted_revenue",
        "q21_suppliers_kept_waiting", "q2_best_supplier", "q8_market_share",
        "q9_product_profit", "q11_important_parts", "q13_customer_distribution",
        "q15_top_supplier", "q17_small_quantity", "q20_significant_suppliers",
        "q22_global_sales_opportunity", "win_tumbling", "win_sliding",
        "win_session", "win_count", "running_total", "topk_per_key",
        "event_sessionize_stats", "events_json_extract", "asof_purchase_view",
        "range_join_views_before_purchase", "events_funnel",
        "events_cohort_retention", "app_celsius", "app_alerts_stateless",
        "app_alerts_stateful", "app_alerts_windowed", "app_alphabet",
        "app_word_count", "app_word_count_collect", "app_market_spread",
        "pipeline_merge", "text_tokens", "text_quality", "text_langid",
        "text_fingerprint", "dedup_normalized", "text_langid_ngram",
        "dedup_exact",
        # CORRECTNESS_r03/r04
        "ann_bruteforce", "ann_index_probe", "ann_ivf", "ann_lsh", "ann_pq",
        "asof_next_view", "chunk_overlap", "cube_pricing",
        "cumulative_revenue_share", "curation_pipeline",
        "decontaminate_holdout", "dedup_clusters", "dedup_embedding",
        "dedup_embedding_lsh", "dedup_keep_best", "dedup_minhash",
        "dedup_ngram_jaccard", "dedup_simhash", "dedup_simhash_pairs",
        "embedding_centroids", "events_value_ranks", "hypertable_rollup",
        "interarrival_stats", "mm_frame_sample", "mm_image_meta",
        "ntile_order_quartiles", "pack_chunks", "part_cooccurrence",
        "pivot_user_event_totals", "q18_bucketed", "q3_bucketed",
        "quantiles_by_type", "resample_1h", "rolling_7d_revenue",
        "rollup_orders", "salted_event_totals", "sample_pps",
        "sample_stratified", "setops_viewer_purchasers",
        "split_train_holdout", "text_repetition", "text_word_entropy",
        "tfidf_top_terms", "value_histogram", "value_outliers",
        "vocab_bigrams",
        # CORRECTNESS_r05
        "app_alphabet_partitioned", "app_celsius_connectors",
        "app_passthrough", "app_alerts_local_agg",
        "app_multi_worker_forwarding", "ann_quantized", "mm_image_header",
        "embedding_kmeans", "sample_temperature", "text_lm_perplexity",
        "text_boilerplate", "docs_length_band", "lang_source_quota",
        "events_dedup_hourly", "event_value_hour_corr", "text_pii_scrub",
        "corpus_mix_report", "revenue_dod_delta", "graph_triangle_count",
    }
)

# Queries whose implementation (or a shared operator they call) changed
# in the CURRENT round: their green rows describe the old plan, so they
# re-enter the driver window. Refresh this set each round.
_CHANGED_THIS_ROUND = frozenset(
    {
        # r6: integer-grid kmeans (operators/kmeans.py, plans/embeddings.py)
        "embedding_kmeans",
        # r6: LM vocabulary cap (plans/curation.py)
        "text_lm_perplexity",
        # r6: scoring-side distinct-count + _fan_out (plans/text.py)
        "text_langid_ngram",
        # r6: header-decoder hardening (operators/multimodal.py)
        "mm_image_header", "mm_image_meta", "mm_frame_sample",
        # r6: checkpoint-block release in connected components
        # (operators/components.py)
        "dedup_clusters", "dedup_keep_best", "curation_pipeline",
        # r6: lloyd_kmeans signature change (float path behavior
        # identical, but the module changed — re-verify)
        "ann_ivf",
        # r6: shared checkpoint pin() threaded through these plans
        # (plans/analytics_ext.py, plans/dedup.py, plans/similarity.py)
        "graph_triangle_count", "dedup_simhash_pairs",
        "dedup_embedding_lsh",
        # r6: bands pinned before the LSH self-join + plain count
        # replaces countDistinct (plans/dedup.py) — re-verify the
        # whole candidate-pair chain
        "dedup_minhash", "dedup_ngram_jaccard",
        # r6: empty-input short-circuits (operators/kmeans.py, pq.py)
        "ann_pq",
        # r6: single-pass rewrite (plans/quality.py)
        "text_boilerplate",
        # r6 continuation: universal-hash minhash (one md5 per shingle,
        # integer permutations) changes the candidate-pair set for the
        # whole family (plans/dedup.py)
        "dedup_substring",
        # r6 continuation: fan_out() on documents scans (tables.py) —
        # values unchanged, plans re-verified
        "text_quality", "text_tokens", "text_fingerprint", "text_langid",
        "dedup_normalized", "text_repetition", "text_word_entropy",
        "decontaminate_holdout", "chunk_overlap", "vocab_bigrams",
        "text_pii_scrub", "corpus_mix_report", "docs_length_band",
        "lang_source_quota", "dedup_exact", "dedup_simhash",
        "sample_stratified", "sample_temperature", "split_train_holdout",
        "pack_chunks", "sample_pps", "mm_thumbnail", "mm_byte_stats",
        "corpus_shard_manifest",
        # (embedding scans are NOT in this set: the _emb fan_out was
        # reverted after measurement, leaving those plans byte-identical
        # to their last driver-green round)
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
