"""Distributed Lloyd's k-means over an embedding column.

Iterative operator (like operators/components.py): the driver holds
ONLY the k × dim centroid matrix — the same bounded-state contract
Spark MLlib's KMeans uses — never rows. Assignment is one Arrow-batch
numpy matmul per partition (no shuffle); the centroid update is a
posexplode + (cluster, pos) aggregate whose map-side combine ships
k × dim partial sums per task. Deterministic by construction: init is
the k lowest ids, iteration count fixed, float64 throughout — reruns
and the single-process numpy reference agree exactly
(tests/test_similarity_ops.py).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def lloyd_kmeans(
    emb: DataFrame,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    return_centroids: bool = False,
):
    """Returns (id_col, cluster, dist) after `iters` Lloyd's rounds;
    with ``return_centroids`` also the trained (k, dim) numpy matrix
    (bounded driver state — what a PQ codebook persists)."""
    import numpy as np

    emb = emb.select(id_col, vec_col)
    cents = np.array(
        [
            r[vec_col]
            for r in emb.orderBy(id_col).limit(k).collect()
        ],
        dtype=np.float64,
    )  # (k, dim) — bounded driver state, like MLlib; init = the k
    # lowest ids regardless of the id space's base or gaps
    if len(cents) < k:
        raise ValueError(f"k={k} centroids requested but only {len(cents)} vectors")

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
                {
                    "cluster": best,
                    "dist": np.sqrt(
                        np.maximum(d[np.arange(len(m)), best], 0.0)
                    ),
                }
            )

        return F.pandas_udf(assign, "cluster long, dist double")

    for _ in range(iters):
        a = emb.withColumn("a", assign_udf(cents)(F.col(vec_col)))
        upd = (
            a.select("a.cluster", F.posexplode(vec_col).alias("p", "v"))
            .groupBy("cluster", "p")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()  # k × dim means — bounded
        )
        nxt = cents.copy()  # empty clusters keep their old centroid
        for r in upd:
            nxt[r["cluster"], r["p"]] = r["m"]
        cents = nxt

    a = emb.withColumn("a", assign_udf(cents)(F.col(vec_col)))
    out = a.select(
        id_col,
        F.col("a.cluster").alias("cluster"),
        F.col("a.dist").alias("dist"),
    )
    return (out, cents) if return_centroids else out
