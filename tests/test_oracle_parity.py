"""Every registered query with an oracle must match DuckDB exactly at
sf0.01 — mirrors the driver's CORRECTNESS gate. Rows-only queries (no
oracle) must at least run and return a stable schema."""

from __future__ import annotations

import pytest

from tests.conftest import SF_MED
from tests.oracle import compare


def _names():
    from wally_spark.plans import REGISTRY

    return sorted(REGISTRY)


@pytest.mark.parametrize("name", _names())
def test_query_parity(spark, name):
    from wally_spark.plans import REGISTRY

    qd = REGISTRY[name]
    if qd.oracle is None:
        df = qd.spark_fn(spark, SF_MED)
        assert df.columns
        assert df.count() >= 0
    else:
        compare(spark, name, SF_MED)


def test_dedup_substring_exact_gram_oracle_both_ways(spark):
    """r7 verdict item 4: dedup_substring's gram identity is selectable
    — xxhash64 default (8-byte keys) vs exact_gram=True (full 128-bit
    md5 for exactness-critical corpora). BOTH must match the registered
    md5 DuckDB oracle cell-for-cell (the default already does as the
    registered query; this pins the md5 path too), and the two paths
    must agree with each other."""
    import duckdb

    from tests.conftest import SF_SMALL
    from tests.oracle import _norm_rows, duck_connection
    from wally_spark.plans import REGISTRY
    from wally_spark.plans.curation import substring_dup_report

    exact = substring_dup_report(spark, SF_SMALL, exact_gram=True)
    default = substring_dup_report(spark, SF_SMALL, exact_gram=False)
    e_rows = _norm_rows(exact.columns, [tuple(r) for r in exact.collect()])
    d_rows = _norm_rows(default.columns, [tuple(r) for r in default.collect()])

    con = duck_connection(SF_SMALL)
    try:
        res = con.execute(REGISTRY["dedup_substring"].oracle)
        ocols = [d[0] for d in res.description]
        o_rows = _norm_rows(ocols, res.fetchall())
    finally:
        con.close()

    assert e_rows == o_rows
    assert d_rows == o_rows


def test_streaming_substring_exact_gram_lane(spark, tmp_path):
    """The streaming persistent-corpus substring lane accepts the same
    exact_gram opt-in: anchor_gram_docs(exact_gram=True) produces md5
    gram arrays whose span reports match the xxhash64 lane's on a
    collision-free corpus."""
    from wally_spark.plans.curation import anchor_gram_docs

    passage = " ".join(f"w{i}" for i in range(15))
    docs = spark.createDataFrame(
        [
            (1, passage + " unique tail one two three four five"),
            (2, passage + " other ending entirely different here now"),
            (3, "no shared content " + " ".join(f"z{i}" for i in range(12))),
        ],
        "doc_id long, text string",
    )
    g64 = anchor_gram_docs(docs)
    g128 = anchor_gram_docs(docs, exact_gram=True)
    r64 = {r["doc_id"]: r["n_words"] for r in g64.collect()}
    r128 = {r["doc_id"]: r["n_words"] for r in g128.collect()}
    assert r64 == r128
    # md5 keys are 32-hex strings; xxhash64 keys are bigints
    assert g128.schema["grams"].dataType.elementType.typeName() == "string"
    assert g64.schema["grams"].dataType.elementType.typeName() == "long"
    # duplicated-gram sets induced by both identities agree (positions
    # of shared prefixes collide across docs 1/2, never doc 3)
    import pyspark.sql.functions as F

    def dup_docs(g):
        ex = g.select("doc_id", F.explode("grams").alias("gram"))
        dup = (
            ex.groupBy("gram")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .where("nd >= 2")
        )
        return sorted(
            r["doc_id"]
            for r in ex.join(dup, "gram").select("doc_id").distinct().collect()
        )

    assert dup_docs(g64) == dup_docs(g128) == [1, 2]
