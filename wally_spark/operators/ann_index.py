"""Persistent ANN index: the banded-LSH corpus materialized once as a
table bucketed on (band_id, band_sig), so every subsequent query probes
single buckets with no corpus re-scan and no shuffle.

Build cost is one corpus pass; query cost is O(bucket size × bands ×
k). At 100 TB this is the resident structure a similarity service
keeps — the transient variant (plans/similarity.py ann_lsh) recomputes
signatures per run. Both use the same 8-band × 4-plane scheme, so
their results agree exactly (asserted in tests/test_ann_index.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from wally_spark.functions import cosine_similarity
from wally_spark.plans.similarity import TOP_K, _banded


def build_ann_index(
    spark: SparkSession, emb: DataFrame, table: str, n_buckets: int = 64
) -> None:
    """Materialize (vec_id, embedding, band_id, band_sig) — one row per
    band — bucketed by the band key so probes are partition-pruned
    bucket reads, never corpus scans."""
    from wally_spark.operators.bucketing import drop_table_and_dir

    drop_table_and_dir(spark, table)

    banded = _banded(emb, "vec_id", "embedding")
    (
        banded.write.mode("overwrite")
        .bucketBy(n_buckets, "band_id", "band_sig")
        .sortBy("band_id", "band_sig")
        .saveAsTable(table)
    )


def query_ann_index(
    spark: SparkSession, table: str, queries: DataFrame, top_k: int = TOP_K
) -> DataFrame:
    """queries: (query_id, embedding). Probes every band's bucket for
    each query (OR-amplification), dedups candidates, and re-ranks by
    exact cosine."""
    idx = spark.table(table)
    q = _banded(
        queries.select(F.col("query_id").alias("vec_id"), "embedding"),
        "query_id",
        "qe",
    )
    cand = (
        idx.alias("c")
        .join(
            F.broadcast(q.alias("q")),
            (F.col("c.band_id") == F.col("q.band_id"))
            & (F.col("c.band_sig") == F.col("q.band_sig"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "vec_id")
    return (
        cand.withColumn("cos", cosine_similarity(F.col("qe"), F.col("embedding")))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rank").cast("bigint").alias("rank"),
            F.floor(10000.0 * F.col("cos")).cast("bigint").alias("cos_bp"),
        )
    )
