"""Embedding-column aggregate/cluster operators — the curation ops a
training-data pipeline runs over `embeddings` beyond similarity
search: per-class centroids (data auditing, nearest-class filtering)
and k-means clustering (diversity sampling / dedup-aware mixing, the
SemDeDup/DSIR-style step).

Scale shapes:
  embedding_centroids — posexplode to (label, pos, v) and aggregate:
    one shuffle keyed (label, pos); partial aggregation map-side means
    the shuffle carries n_labels × dim partial sums per task, not
    vectors. 100 TB-safe.
  embedding_kmeans — Lloyd's iterations: centroids live on the driver
    (k × dim doubles — bounded and tiny, the same contract Spark
    MLlib uses), assignment is one Arrow-batched numpy matmul per
    batch (no shuffle), centroid update is the posexplode aggregate
    above. Deterministic: init = the k lowest vec_ids, fixed iteration
    count, so reruns agree bit-for-bit (asserted in tests).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from wally_spark.plans.registry import register
from wally_spark.tables import load_tables

K = 8
ITERS = 4


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["embeddings"]


@register(
    "embedding_centroids",
    oracle="""
WITH ex AS (
  SELECT label,
         unnest(list_transform(range(1, len(embedding) + 1),
           i -> {'pos': i, 'v': embedding[i]::DOUBLE})) AS u
  FROM embeddings
)
SELECT label, u.pos::BIGINT AS pos,
       floor(10000.0 * avg(u.v))::BIGINT AS centroid_bp,
       count(*) AS n_vecs
FROM ex GROUP BY label, u.pos
""",
    tags=("embeddings", "centroid"),
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, component-wise: posexplode + (label, pos)
    aggregate. The declarative twin of `AVG(vector)` — no UDF, fully
    codegen, map-side combined."""
    emb = _emb(spark, sf_dir)
    return (
        emb.select("label", F.posexplode("embedding").alias("p", "v"))
        .groupBy("label", (F.col("p") + 1).cast("bigint").alias("pos"))
        .agg(
            F.floor(10000.0 * F.avg(F.col("v").cast("double")))
            .cast("bigint")
            .alias("centroid_bp"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
    )


@register("embedding_kmeans", oracle=None, tags=("embeddings", "kmeans", "iterative"))
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd's k-means (K=8, ITERS=4, init = the K
    lowest vec_ids): returns (vec_id, cluster, dist_bp). Iterative
    driver loop over distributed passes — assignment never shuffles
    (numpy matmul per Arrow batch against broadcast centroids);
    centroid update is one (cluster, pos) aggregate per round.
    Rows-only oracle (iterative float argmin isn't reasonably
    SQL-expressible); pytest gates determinism, full cluster coverage,
    and non-increasing inertia per round."""
    import numpy as np

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    cents = np.array(
        [
            r["embedding"]
            for r in emb.where(F.col("vec_id") < K)
            .orderBy("vec_id")
            .collect()
        ],
        dtype=np.float64,
    )  # (K, dim) — bounded driver state, like MLlib

    def assign_udf(cmat):
        c = cmat.copy()

        def assign(emb_series: "pd.Series") -> "pd.DataFrame":
            if not len(emb_series):
                return pd.DataFrame({"cluster": [], "dist": []})
            m = np.array(emb_series.tolist(), dtype=np.float64)
            # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin over c
            d = (
                (m * m).sum(1, keepdims=True)
                - 2.0 * (m @ c.T)
                + (c * c).sum(1)
            )
            best = d.argmin(1)
            return pd.DataFrame(
                {"cluster": best, "dist": np.sqrt(np.maximum(d[np.arange(len(m)), best], 0.0))}
            )

        return F.pandas_udf(assign, "cluster long, dist double")

    for _ in range(ITERS):
        a = emb.withColumn("a", assign_udf(cents)(F.col("embedding")))
        upd = (
            a.select("a.cluster", F.posexplode("embedding").alias("p", "v"))
            .groupBy("cluster", "p")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        nxt = cents.copy()  # empty clusters keep their old centroid
        by_c: dict[int, dict[int, float]] = {}
        for r in upd:
            by_c.setdefault(r["cluster"], {})[r["p"]] = r["m"]
        for cid, comps in by_c.items():
            for p, v in comps.items():
                nxt[cid, p] = v
        cents = nxt

    a = emb.withColumn("a", assign_udf(cents)(F.col("embedding")))
    return a.select(
        "vec_id",
        F.col("a.cluster").alias("cluster"),
        F.floor(10000.0 * F.col("a.dist")).cast("bigint").alias("dist_bp"),
    )
