"""Focused gates for the r14 optimization changes.

- edit_distance equality short-circuit is result-identical to the bare
  banded Levenshtein (incl. the past-band -1 sentinel).
- the pool_filter_report shared model-count pass produces the exact
  _ppl_model probs/stats (c1+c0 == count(*) over the same tokens).
- fan_out memoises the partition-count probe per (session, file set).
- the graph pre-partition knob defaults OFF (VERDICT r13 #1).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL


def test_edit_distance_eqfast_identical(spark):
    from wally_spark.operators.editforest import edit_distance

    rows = [
        ("abc", "abc"),          # equal -> 0 via short-circuit
        ("", ""),                # empty-equal -> 0
        ("abc", "abd"),          # small edit
        ("abc", "zzzzzzzzzz"),   # past band -> -1 sentinel
        ("kitten", "sitting"),
    ]
    df = spark.createDataFrame(rows, "pa string, pb string")
    spark.conf.set("spark.wally.edit.eqfast", "false")
    try:
        bare = [
            r.e for r in df.select(
                edit_distance("pa", "pb", 3).alias("e")).collect()
        ]
    finally:
        spark.conf.unset("spark.wally.edit.eqfast")
    fast = [
        r.e for r in df.select(
            edit_distance("pa", "pb", 3).alias("e")).collect()
    ]
    assert fast == bare
    assert fast[0] == 0 and fast[1] == 0 and fast[3] == -1


def test_pool_shared_counts_match_ppl_model(spark):
    from wally_spark.plans.curation import (
        _docs,
        _ppl_model,
        _ppl_model_from_counts,
        nb_token_counts,
    )

    docs = _docs(spark, SF_SMALL)
    sampled = F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, 1
    ).isin("0", "1", "2", "3")
    probs_a, stats_a = _ppl_model(docs)
    probs_b, stats_b = _ppl_model_from_counts(
        nb_token_counts(docs.where(sampled)).select(
            "word", (F.col("c1") + F.col("c0")).cast("bigint").alias("c")
        )
    )
    assert sorted(map(tuple, probs_a.collect())) == sorted(
        map(tuple, probs_b.collect())
    )
    assert stats_a.collect() == stats_b.collect()


def test_fan_out_memoises_partition_probe(spark, monkeypatch):
    import wally_spark.tables as T

    docs = T.load_tables(spark, SF_SMALL)["documents"]
    T._NPART_MEMO.clear()
    T.fan_out(docs.select("doc_id"), "doc_id")
    assert len(T._NPART_MEMO) == 1
    (key,) = T._NPART_MEMO
    probed = T._NPART_MEMO[key]

    # second call (different projection, same files) must hit the memo:
    # poison .rdd so a re-probe would blow up
    class _Boom:
        def __getattr__(self, _):  # pragma: no cover - fails the test
            raise AssertionError("fan_out re-probed getNumPartitions")

    monkeypatch.setattr(
        type(docs), "rdd", property(lambda self: _Boom()), raising=False
    )
    T.fan_out(docs.select("doc_id", "text"), "doc_id")
    assert T._NPART_MEMO[key] == probed


def test_minhash_fsb_knob_arms_identical(spark):
    """The default (r14) is the pair-keyed groupBy spelling;
    spark.wally.minhash.fsb=true selects the r13 first-shared-band
    arm. Both arms must emit the identical candidate multiset
    (doc_a, doc_b, shared_bands)."""
    from wally_spark.plans.registry import REGISTRY

    fn = REGISTRY["dedup_minhash"].spark_fn

    def rows():
        return sorted(map(tuple, fn(spark, SF_SMALL).collect()))

    base = rows()
    spark.conf.set("spark.wally.minhash.fsb", "true")
    try:
        fsb_arm = rows()
    finally:
        spark.conf.unset("spark.wally.minhash.fsb")
    assert fsb_arm == base and len(base) > 0


def test_graph_prepartition_defaults_off(spark):
    from wally_spark.operators.components import _prepartition_on

    assert _prepartition_on(spark) is False
    spark.conf.set("spark.wally.graph.prepartition", "true")
    try:
        assert _prepartition_on(spark) is True
    finally:
        spark.conf.unset("spark.wally.graph.prepartition")
