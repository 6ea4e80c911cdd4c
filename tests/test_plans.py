"""Physical-plan quality gates (SURVEY §6): filters and projections
must reach the parquet scan, dimension joins must broadcast, and
codegen must cover the relational hot paths. These assert on
`.explain("formatted")` output so a regression that silently degrades
the 100 TB plan fails CI."""

from __future__ import annotations

import pytest

from tests.conftest import SF_MED


def _plan(spark, name: str, execute: bool = False, mode: str = "formatted") -> str:
    from wally_spark.plans import REGISTRY

    df = REGISTRY[name].spark_fn(spark, SF_MED)
    if execute:  # AQE: the final plan only exists after execution
        df.collect()
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_q6_filter_pushdown(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    # shipdate/discount/quantity predicates reach the scan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q6_column_pruning(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # only the 4 needed columns are read, not all 11
    assert "l_extendedprice" in read_schema and "l_returnflag" not in read_schema


def test_dim_joins_broadcast(spark):
    for q in ("q3_shipping_priority", "q5_local_supplier", "q10_returned_items"):
        plan = _plan(spark, q)
        assert "BroadcastHashJoin" in plan, f"{q}: dimension join didn't broadcast"


def test_no_cartesian_in_lsh(spark):
    plan = _plan(spark, "dedup_minhash")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_codegen_covers_relational(spark):
    plan = _plan(spark, "q1_pricing_summary", execute=True, mode="simple")
    assert "isFinalPlan=true" in plan
    # "*(n)" prefixes mark whole-stage-codegen stages in the final plan
    assert "*(1)" in plan and "*(2)" in plan


def test_events_scan_pruned(spark):
    plan = _plan(spark, "win_tumbling")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in read_schema, "unused props column read in window agg"


def test_no_driver_collect_in_plans():
    """No registered plan may materialize data on the driver: collect()
    and toPandas() inside an operator are OOM scale-killers at the
    100 TB target (round-1 dedup_embedding/ann_quantized regression)."""
    import ast
    import pathlib

    plans_dir = pathlib.Path(__file__).parent.parent / "wally_spark" / "plans"
    banned = {"collect", "toPandas", "toLocalIterator"}
    offenders = []
    for p in sorted(plans_dir.glob("*.py")):
        tree = ast.parse(p.read_text())
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in banned
            ):
                offenders.append(f"{p.name}:{node.lineno} .{node.func.attr}(")
    assert not offenders, f"driver-side materialization in plans: {offenders}"


def test_bucketed_q3_no_exchange(spark):
    """q3 over pre-bucketed facts must not shuffle: the orderkey join
    and groupBy reuse write-time bucketing (SURVEY §2.7); only the
    final top-k ordering may move data."""
    from wally_spark.plans.bucketed import bucketed_facts

    bucketed_facts(spark, SF_MED)  # build so the plan sees bucketed scans
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # keep the fact-fact join a sort-merge so the property is visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10240")
    try:
        plan = _plan(spark, "q3_bucketed")
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_pack_chunks_no_global_window(spark):
    """The packing prefix sum must never plan a single-partition global
    window — the whole point of the two-phase bucket design."""
    for q in ("pack_chunks", "sample_pps"):
        plan = _plan(spark, q)
        assert "SinglePartition" not in plan, (q, plan)
        assert "Window" in plan  # the per-bucket cumsum is still a window


def test_rfm_no_global_window(spark):
    """user_rfm_segments scores quartiles over the (unbounded) user
    relation via the two-phase global_ntile — never a single-partition
    ntile window (r7: the lane shipped with three of them). The
    remaining SinglePartition exchanges feed 1-row scalar aggregates
    (percentile cuts, ref date) — bounded by construction; the gate
    targets the WINDOW trap: no ntile function at all, and every
    window operator partitioned by the prefix bucket."""
    import re

    plan = _plan(spark, "user_rfm_segments", mode="simple")
    # boundary guard: "percentile(" (the cut agg) contains "ntile("
    assert not re.search(r"(?<![a-z])ntile\(", plan), plan
    win_lines = [ln for ln in plan.splitlines() if "windowspecdefinition(" in ln]
    assert win_lines, plan  # the per-bucket rank windows must exist
    for ln in win_lines:
        assert "windowspecdefinition(_gb" in ln, ln


def test_ntile_quartiles_no_global_window(spark):
    """ntile_order_quartiles migrated off its single-partition global
    ntile window in r13 (the last acknowledged one in the registry —
    VERDICT r12 "What's wrong" #1). Same gate shape as
    test_rfm_no_global_window: no ntile function anywhere in the plan,
    and every window operator partitioned by the prefix bucket."""
    import re

    plan = _plan(spark, "ntile_order_quartiles", mode="simple")
    assert not re.search(r"(?<![a-z])ntile\(", plan), plan
    win_lines = [ln for ln in plan.splitlines() if "windowspecdefinition(" in ln]
    assert win_lines, plan  # the per-bucket rank windows must exist
    for ln in win_lines:
        assert "windowspecdefinition(_gb" in ln, ln


def test_centroids_partial_aggregation(spark):
    """embedding_centroids must partial-aggregate map-side: the
    exchange carries (label, pos) partial sums, not exploded vector
    components."""
    plan = _plan(spark, "embedding_centroids")
    assert "partial_avg" in plan and "partial_count" in plan, plan


def test_no_cartesian_anywhere(spark):
    """Registry-wide: no registered query may plan a CartesianProduct.
    BroadcastNestedLoopJoin is allowed only where a bounded tiny side
    makes it the right plan (dedup_embedding's NB×NB block pairing,
    langid's ≤20×langs profile probe)."""
    from wally_spark.plans import REGISTRY

    bnl_ok = {
        "dedup_embedding",  # NB×NB block pairing, both sides tiny
        "curation_pipeline",  # same block pairing inside the composition
        "ann_bruteforce",  # broadcast 10-query set, != condition: the
        "ann_quantized",  # linear-scan design IS broadcast-NL
        "q11_important_parts",  # scalar-subquery threshold:
        "q22_global_sales_opportunity",  # 1-row broadcast side
        "resample_1h",  # 1-row (min,max) bounds side for the grid
        "events_funnel",  # 1-row stage-count sides
        "graph_triangle_count",  # 1-row × 1-row (n_edges, n_triangles) combine
        "corpus_mix_report",  # 1-row grand-total side for the share divisor
        "text_lm_perplexity",  # two 1-row (T, V) stats combines
        "doc_nb_classifier",  # 1-row class-stats and prior combines
        "nb_calibration",  # composes doc_nb_classifier's 1-row combines
        "pool_filter_report",  # composes NB + perplexity 1-row combines
        "sample_temperature",  # 1-row temperature-normalizer side
        "dsir_importance",  # 1-row (rt, tt) totals side for the LM divisors
        "gap_fill_locf",  # 1-row (h0, h1) bounds side for the hour grid
        "bm25_rank",  # 1-row (n_docs, total_w) stats side
        "token_pmi",  # 1-row (tb, tu) totals side
        "ngram_coverage",  # 1-row occurrence-total side
        "user_rfm_segments",  # 1-row reference-date side
        "embedding_pca_power",  # four 1-row rescale-divisor sides
        "knn_label_vote",  # broadcast 10-query set, != condition (as ann_bruteforce)
        "text_lm_bigram",  # 1-row UNK-mass training-total side
        "basket_rules",  # 1-row basket-total side for the lift divisor
        "user_activity_gaps",  # 1-row corpus-frontier (max ts) side
        "token_budget_allocation",  # 1-row total-weight side for shares
        "ann_recall_report",  # composes ann_bruteforce's broadcast-NL scan
        "text_ngram_novelty",  # 1-row (mn, mx) id-bounds side for slicing
        "user_churn_features",  # 1-row corpus-frontier (max ts) side
        "events_benford",  # 1-row grand-total side for the share divisor
        "user_purchase_intervals",  # 1-row histogram-total side
        "session_conversion_lag",  # 1-row histogram-total side
        "sample_kfold_assign",  # 1-row fold-total side for dev_bp
        "embedding_cluster_balance",  # 1-row corpus-total side onto K rows
        "join_skew_audit",  # 1-row (total, n_keys) side for the shares
        "dedup_cluster_size_hist",  # 1-row corpus-total side for share_bp
        "text_lm_kneser_ney",  # 1-row bigram-type-total side
        "dq_referential_audit",  # five 1-row (orphans × total) combines
        "token_source_mi",  # 1-row corpus-token-total (n) side
        "source_token_kl",  # same 1-row n side via kl_terms_from_joint
        "repetition_mixing_schedule",  # composes token_budget_allocation's
        # 1-row total-weight side
        "simhash_recall_audit",  # 1-row emitted/dropped cost-stats side
        "bloom_dedup_audit",  # four 1-row count-stats combines
        "tokenizer_unigram_lm",  # 1-row vocab-total (cost normalizer)
        # and 1-row vocab-size sides per EM round
        "unigram_fertility_by_source",  # same 1-row cost-normalizer
        # sides via the shared trained chain
    }
    offenders = []
    for name in sorted(REGISTRY):
        if "iterative" in REGISTRY[name].tags:
            continue  # plan-building runs driver loops; covered by their own tests
        plan = _plan(spark, name)
        if "CartesianProduct" in plan:
            offenders.append(f"{name}: cartesian")
        if "BroadcastNestedLoopJoin" in plan and name not in bnl_ok:
            offenders.append(f"{name}: BNL join")
    assert not offenders, offenders


def test_bucketed_q18_no_exchange(spark):
    """q18 over pre-bucketed facts: HAVING pre-agg, semi-join, orders
    join, and the final groupBy (key set includes o_orderkey) all
    reuse write-time bucketing — zero Exchange hashpartitioning."""
    from wally_spark.plans.bucketed import bucketed_facts

    bucketed_facts(spark, SF_MED)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10240")
    try:
        plan = _plan(spark, "q18_bucketed")
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_runtime_bloom_filter_injection(spark):
    """Spark's runtime Bloom-filter join pruning — the 100 TB lever
    that pre-filters a fact scan with a bloom built from the selective
    side — engages on our fact-fact shape once the (cluster-sized)
    thresholds fit the local data. Pins the knobs the deployment must
    set; the plan must show the injected bloom_filter_agg."""
    import pyspark.sql.functions as F

    from wally_spark.tables import load_tables

    t = load_tables(spark, SF_MED)
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
        big = t["orders"].where(F.col("o_orderpriority") == "1-URGENT")
        j = t["lineitem"].join(big, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "bloom_filter_agg" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_triangle_wedge_join_salted(spark):
    """Hub-part guard: the triangle wedge join (single-part-id key)
    must run salted so a hub's wedges spread across reducers
    (VERDICT r4 #8)."""
    plan = _plan(spark, "graph_triangle_count")
    assert "__salt" in plan, "wedge join is not salted"


def test_lang_source_quota_two_phase(spark):
    """Hot-cell guard: the quota sample must pre-prune with a window on
    (spark_partition_id, cell) before the global cell window, so a
    pathological cell's mass is bounded per task (VERDICT r4 #5)."""
    plan = _plan(spark, "lang_source_quota")
    assert plan.count("Window") >= 2, "two-phase window shape missing"
    assert "SPARK_PARTITION_ID" in plan.upper(), (
        "per-partition pre-prune window missing"
    )


def test_driver_window_covers_unchecked_queries():
    """The correctness driver checks the FIRST 50 registry entries.

    Every query that needs a (re-)check — never driver-green, OR
    changed this round so its green row describes a stale plan — must
    sit inside that window; no escape hatch: if that set outgrows the
    window, that's a rotation bug to fix, not a state to tolerate
    (VERDICT r4 "Next round #1", r5 "What's missing #2").
    No-oracle queries can never go green; they must sort last so they
    never burn a window slot.
    """
    from wally_spark.plans import (
        REGISTRY,
        _CHANGED_THIS_ROUND,
        _DRIVER_GREEN,
        _NO_ORACLE,
    )

    names = list(REGISTRY)
    window = set(names[:50])
    needs_check = [
        n
        for n in names
        if (n not in _DRIVER_GREEN or n in _CHANGED_THIS_ROUND)
        and n not in _NO_ORACLE
    ]
    assert len(needs_check) <= 50, (
        f"{len(needs_check)} queries needing a driver check exceed the "
        f"50-row window; stale greens must be promoted into _DRIVER_GREEN"
    )
    missing = set(needs_check) - window
    assert not missing, f"check-needing queries outside window: {missing}"
    # The front block is exactly the needs-check set, in order.
    assert names[: len(needs_check)] == needs_check
    # Every name in _CHANGED_THIS_ROUND is a real registered query
    # (typos would silently front nothing).
    assert _CHANGED_THIS_ROUND <= set(names)
    # No-oracle queries are parked at the very end.
    assert names[-len(_NO_ORACLE):] == [n for n in names if n in _NO_ORACLE]


def test_nb_classifier_broadcasts_model(spark):
    """doc_nb_classifier's scoring join must broadcast the ≤NB_VOCAB-row
    weight table — a shuffle join on `word` would re-shuffle the whole
    token stream against a 16-row side."""
    plan = _plan(spark, "doc_nb_classifier")
    assert "BroadcastHashJoin" in plan, plan


def test_random_projection_broadcasts_signs(spark):
    """embedding_random_projection joins the (dim × RP_DIMS) sign table
    broadcast — it is ≤ dim rows by construction."""
    plan = _plan(spark, "embedding_random_projection")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_heavy_hitters_takeordered(spark):
    """heavy_hitters_report's design claim: each per-column top-K is a
    distributed TakeOrderedAndProject (partial top-K per partition),
    NEVER a full sort or a single-partition window over the distinct
    keys — the property that keeps the profiler cheap at 100 TB."""
    plan = _plan(spark, "heavy_hitters_report")
    assert "TakeOrderedAndProject" in plan, plan
    assert "WindowExec" not in plan and "Window " not in plan, plan


def test_churn_features_two_level_aggregate(spark):
    """user_churn_features routes through the (user, day, type)
    churn_profile partial — the associative grain its streaming twin
    persists — before the user rollup: the plan must show BOTH
    aggregate keys, and the raw-event relation must be aggregated
    before the frontier broadcast joins on."""
    plan = _plan(spark, "user_churn_features")
    assert plan.count("HashAggregate") >= 4, plan  # 2 levels x partial/final
    assert "BroadcastNestedLoopJoin" in plan, plan  # 1-row frontier side


def test_grouping_sets_single_shuffle(spark):
    """orders_grouping_sets: Spark must expand all four grouping sets
    into ONE Expand feeding a single aggregate — exactly one Exchange
    regardless of how many sets (the design claim vs running four
    aggregates)."""
    import re

    plan = _plan(spark, "orders_grouping_sets")
    assert "Expand" in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_ewma_single_user_shuffle(spark):
    """events_ewma: the asc lag frame, the partition count, and the
    desc row_number must all reuse ONE user_id shuffle — exactly one
    Exchange in the plan (re-sorting within partitions is fine; a
    second shuffle is not)."""
    import re

    plan = _plan(spark, "events_ewma")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_repetition_mixing_schedule_invariants(spark):
    """Schedule sanity at SF_MED: the run never draws more than its
    target or more than MAX_REPEAT epochs of unique supply; effective
    tokens never exceed drawn tokens (epoch values are <= 1000 milli);
    utility is <= 10000 bp and a slice that must repeat (epochs > 1)
    is strictly discounted vs its draw."""
    from tests.conftest import SF_MED
    from wally_spark.plans import REGISTRY
    from wally_spark.plans.sampling import MAX_REPEAT

    rows = (
        REGISTRY["repetition_mixing_schedule"]
        .spark_fn(spark, SF_MED)
        .collect()
    )
    assert rows
    for r in rows:
        assert r["unique_tokens"] <= r["tokens"]
        assert 0 <= r["epochs_scheduled"] <= MAX_REPEAT
        assert r["scheduled_tokens"] <= r["target_tokens"]
        assert r["scheduled_tokens"] <= r["unique_tokens"] * max(
            r["epochs_scheduled"], 1
        )
        assert r["effective_tokens"] <= r["scheduled_tokens"]
        if r["target_tokens"] > 0:
            assert r["utility_bp"] <= 10000
        if r["epochs_scheduled"] > 1:
            # at least one repeated epoch -> geometric discount bites
            assert r["effective_tokens"] < r["scheduled_tokens"]
