from __future__ import annotations

import shutil

import pyspark.sql.functions as F

from tests.conftest import SF_MED
from wally_spark.operators.ann_index import build_ann_index, query_ann_index
from wally_spark.tables import load_tables


def test_ann_index_build_and_query(spark):
    emb = load_tables(spark, SF_MED)["embeddings"]
    spark.sql("DROP TABLE IF EXISTS ann_idx")
    shutil.rmtree("spark-warehouse/ann_idx", ignore_errors=True)
    build_ann_index(spark, emb, "ann_idx", n_buckets=16)

    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = query_ann_index(spark, "ann_idx", queries, top_k=5)
    rows = res.collect()
    assert len(rows) > 0
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        assert len(rs) <= 5
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == list(
            range(1, len(rs) + 1)
        )
        assert all(r["neighbor_id"] != q for r in rs)
    # results agree with the transient LSH query (same signature fn)
    from wally_spark.plans import REGISTRY

    transient = REGISTRY["ann_lsh"].spark_fn(spark, SF_MED).collect()
    t_pairs = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in transient}
    i_pairs = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in rows}
    assert i_pairs == t_pairs
