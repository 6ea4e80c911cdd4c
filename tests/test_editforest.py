"""verify_on_demand_clusters: the Boruvka spanning-forest verifier
must produce components IDENTICAL to connected components over the
full dedup_edit_verified pair relation, while verifying strictly
fewer candidates on a dup-heavy corpus."""

import pyspark.sql.functions as F

from tests.conftest import SF_MED, SF_SMALL


def _inputs(spark, sf_dir):
    from wally_spark.operators.checkpoint import pin
    from wally_spark.plans.dedup import dedup_simhash, simhash_candidate_pairs
    from wally_spark.plans.llm_ext import EDIT_CAND_HAMMING, EDIT_PREFIX_CHARS
    from wally_spark.tables import load_tables

    d = pin(dedup_simhash(spark, sf_dir))
    cand = simhash_candidate_pairs(d, EDIT_CAND_HAMMING).select(
        "doc_a", "doc_b"
    )
    prefixes = load_tables(spark, sf_dir)["documents"].select(
        "doc_id",
        F.substring(F.lower("text"), 1, EDIT_PREFIX_CHARS).alias("prefix"),
    )
    return cand, prefixes


def _full_verify_clusters(spark, sf_dir):
    from wally_spark.operators.components import connected_components
    from wally_spark.plans import REGISTRY

    pairs = REGISTRY["dedup_edit_verified"].spark_fn(spark, sf_dir)
    cand, _ = _inputs(spark, sf_dir)
    docs = (
        cand.select(F.col("doc_a").alias("id"))
        .unionByName(cand.select(F.col("doc_b").alias("id")))
        .distinct()
    )
    cc = connected_components(
        docs, pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    return sorted((r["id"], r["comp"]) for r in cc.collect())


def test_forest_clusters_match_full_verify(spark):
    from wally_spark.operators.editforest import verify_on_demand_clusters
    from wally_spark.plans.llm_ext import _EDIT_MAX, EDIT_KEEP_BP

    for sf_dir in (SF_SMALL, SF_MED):
        cand, prefixes = _inputs(spark, sf_dir)
        clusters, stats = verify_on_demand_clusters(
            cand, prefixes, EDIT_KEEP_BP, _EDIT_MAX
        )
        got = sorted((r["doc_id"], r["cluster"]) for r in clusters.collect())
        want = _full_verify_clusters(spark, sf_dir)
        assert got == want, (sf_dir, stats)
        # sparse corpora (sf0.001/sf0.01 verify pass rates are ~2%)
        # bail to the exact fallback — never MORE verifications than
        # one round + the tail; the dense-corpus savings are pinned by
        # test_forest_saves_verifications_on_dense_clusters
        assert stats["verified"] <= stats["candidates"], stats
        assert stats["verified"] == (
            stats["candidates"] - stats["skipped_unverified"]
        )


def test_forest_round_cap_fallback_is_exact(spark):
    """With max_rounds=1 and the pre-probe forced onto the dense path
    (bail_pass_bp=0), the cap fallback verifies the remaining
    cross-component tail in one pass — same components, just at a
    higher verify price. And with the probe left at its default on
    this sparse corpus (~2% pass rate), the probe must skip the loop
    entirely (rounds == 0) and still land the same components."""
    from wally_spark.operators.editforest import verify_on_demand_clusters
    from wally_spark.plans.llm_ext import _EDIT_MAX, EDIT_KEEP_BP

    want = _full_verify_clusters(spark, SF_SMALL)

    cand, prefixes = _inputs(spark, SF_SMALL)
    clusters, stats = verify_on_demand_clusters(
        cand, prefixes, EDIT_KEEP_BP, _EDIT_MAX, max_rounds=1,
        bail_pass_bp=0,
    )
    got = sorted((r["doc_id"], r["cluster"]) for r in clusters.collect())
    assert got == want
    assert stats["rounds"] == 1 and stats["fallback_verified"] >= 0

    cand, prefixes = _inputs(spark, SF_SMALL)
    clusters, stats = verify_on_demand_clusters(
        cand, prefixes, EDIT_KEEP_BP, _EDIT_MAX
    )
    got = sorted((r["doc_id"], r["cluster"]) for r in clusters.collect())
    assert got == want
    assert stats["rounds"] == 0, stats  # probe skipped the loop
    assert stats["probe_pass_bp"] is not None
    assert stats["probe_pass_bp"] < 2000, stats


def test_forest_saves_verifications_on_dense_clusters(spark):
    """The regime the operator exists for: near-clique dup clusters
    (the sf1 dupstress shape). Components must match full-verify CC
    while the verify count collapses from O(pairs) to O(docs)."""
    import itertools

    from wally_spark.operators.editforest import verify_on_demand_clusters

    # 3 clusters x 40 near-identical docs: candidates = all intra-
    # cluster pairs (plus none across), every pair passes the verify
    docs = []
    for c in range(3):
        base = f"cluster{c} " * 30
        for i in range(40):
            docs.append((c * 100 + i, base + f"tail{i}"))
    prefixes = spark.createDataFrame(
        [(i, t[:200].lower()) for i, t in docs], "doc_id bigint, prefix string"
    )
    cand = spark.createDataFrame(
        [
            (c * 100 + a, c * 100 + b)
            for c in range(3)
            for a, b in itertools.combinations(range(40), 2)
        ],
        "doc_a bigint, doc_b bigint",
    )
    from wally_spark.plans.llm_ext import _EDIT_MAX, EDIT_KEEP_BP

    clusters, stats = verify_on_demand_clusters(
        cand, prefixes, EDIT_KEEP_BP, _EDIT_MAX
    )
    got = sorted((r["doc_id"], r["cluster"]) for r in clusters.collect())
    assert got == [(c * 100 + i, c * 100) for c in range(3) for i in range(40)]
    # 2340 candidate pairs, 120 docs: the forest verifies O(docs)
    assert stats["candidates"] == 3 * (40 * 39) // 2
    assert stats["verified"] < stats["candidates"] // 4, stats
    assert stats["skipped_unverified"] > stats["candidates"] // 2, stats
