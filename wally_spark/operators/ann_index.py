"""Persistent ANN index: the LSH-bucketed corpus materialized once as
a table bucketed on the signature, so every subsequent query probes
single buckets with no corpus re-scan and no shuffle.

Build cost is one corpus pass; query cost is O(bucket size × k). At
100 TB this is the resident structure a similarity service keeps —
the transient variants (plans/similarity.py) recompute signatures per
run."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from wally_spark.functions import cosine_similarity
from wally_spark.plans.similarity import lsh_signature


def build_ann_index(
    spark: SparkSession, emb: DataFrame, table: str, n_buckets: int = 64
) -> None:
    """Materialize (vec_id, embedding, bucket) bucketed by the LSH
    signature's bucket so probes are partition-pruned file reads."""
    bucketed = emb.select(
        "vec_id", "embedding", lsh_signature(F.col("embedding")).alias("sig")
    )
    (
        bucketed.write.mode("overwrite")
        .bucketBy(n_buckets, "sig")
        .sortBy("sig")
        .saveAsTable(table)
    )


def query_ann_index(
    spark: SparkSession, table: str, queries: DataFrame, top_k: int = 5
) -> DataFrame:
    """queries: (query_id, embedding). Probes each query's signature
    bucket and re-ranks by exact cosine within it."""
    idx = spark.table(table)
    q = queries.select(
        F.col("query_id"),
        F.col("embedding").alias("qe"),
        lsh_signature(F.col("embedding")).alias("qsig"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "vec_id")
    return (
        idx.join(F.broadcast(q), F.col("sig") == F.col("qsig"))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cosine_similarity(F.col("qe"), F.col("embedding")))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rank").cast("bigint").alias("rank"),
            F.floor(10000.0 * F.col("cos")).cast("bigint").alias("cos_bp"),
        )
    )
