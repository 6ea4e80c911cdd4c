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
    grid: int | None = None,
):
    """Returns (id_col, cluster, dist) after `iters` Lloyd's rounds;
    with ``return_centroids`` also the trained (k, dim) numpy matrix
    (bounded driver state — what a PQ codebook persists).

    ``grid``: when set (a power-of-two scale, e.g. 2**20), ALL k-means
    arithmetic runs on an integer lattice: components quantize to
    floor(v*grid + 0.5) — exact in float64 for power-of-two grids over
    float32 inputs — distances are exact int64 sums, and centroid
    means are exact floor divisions of integer sums. Integer sums are
    order-independent, so the result is bit-identical regardless of
    partitioning, AQE plan changes, or BLAS — which is what makes a
    cross-engine hash-exact oracle principled rather than empirical
    (the float path's equality at argmin near-ties depends on
    accumulation order). `dist` is still returned in original units:
    sqrt(d2_int)/grid (division by a power of two is exact)."""
    if grid is not None:
        return _lloyd_kmeans_grid(
            emb, k, iters, id_col, vec_col, return_centroids, grid
        )
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
    if len(cents) == 0:
        # empty-input short-circuit: a legitimately empty corpus slice
        # (date-pruned partition, filtered language) yields an empty
        # assignment, not a dead job. 0 < n < k stays a loud error — a
        # misconfigured k, not an empty input.
        out = emb.limit(0).select(
            id_col,
            F.lit(None).cast("long").alias("cluster"),
            F.lit(None).cast("double").alias("dist"),
        )
        return (out, cents.reshape(0, 0)) if return_centroids else out
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


def _lloyd_kmeans_grid(
    emb: DataFrame,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
    return_centroids: bool,
    grid: int,
):
    """Integer-lattice Lloyd's (see lloyd_kmeans's ``grid`` contract).
    Every cross-partition reduction is an int64 sum/count, so the
    answer cannot move with partitioning; the only float ops are the
    exact quantization product and the final sqrt of an exact integer,
    both correctly rounded identically on any IEEE engine."""
    import numpy as np

    # floor(v*grid + 0.5): exact for power-of-two grid over float32 v
    vq = emb.select(
        id_col,
        F.transform(
            vec_col,
            lambda x: F.floor(x.cast("double") * float(grid) + F.lit(0.5)),
        ).alias("_vq"),
    )
    cents = np.array(
        [r["_vq"] for r in vq.orderBy(id_col).limit(k).collect()],
        dtype=np.int64,
    )
    if len(cents) == 0:
        # empty-input short-circuit (see the float path above)
        out = vq.limit(0).select(
            id_col,
            F.lit(None).cast("long").alias("cluster"),
            F.lit(None).cast("double").alias("dist"),
        )
        return (out, cents.reshape(0, 0)) if return_centroids else out
    if len(cents) < k:
        raise ValueError(f"k={k} centroids requested but only {len(cents)} vectors")

    def assign_udf(cmat):
        c = cmat.copy()

        def assign(vq_series: "pd.Series") -> "pd.DataFrame":
            if not len(vq_series):
                return pd.DataFrame({"cluster": [], "dist": []})
            m = np.array(vq_series.tolist(), dtype=np.int64)
            # exact int64: ||x||² - 2x·c + ||c||² ≡ Σ(x-c)² — integer
            # arithmetic has no rounding, so the expanded form is
            # literally equal to the direct form
            d = (
                (m * m).sum(1, keepdims=True)
                - 2 * (m @ c.T)
                + (c * c).sum(1)
            )
            best = d.argmin(1)  # ties → lowest cluster
            d2 = d[np.arange(len(m)), best]
            return pd.DataFrame(
                {
                    "cluster": best,
                    "dist": np.sqrt(d2.astype(np.float64)) / grid,
                }
            )

        return F.pandas_udf(assign, "cluster long, dist double")

    for _ in range(iters):
        a = vq.withColumn("a", assign_udf(cents)(F.col("_vq")))
        upd = (
            a.select("a.cluster", F.posexplode("_vq").alias("p", "v"))
            .groupBy("cluster", "p")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # k × dim exact (sum, count) pairs — bounded
        )
        nxt = cents.copy()  # empty clusters keep their old centroid
        for r in upd:
            # Python // is floor division on exact ints — the oracle
            # mirrors it via the nonnegative-remainder identity
            nxt[r["cluster"], r["p"]] = int(r["s"]) // int(r["n"])
        cents = nxt

    a = vq.withColumn("a", assign_udf(cents)(F.col("_vq")))
    out = a.select(
        id_col,
        F.col("a.cluster").alias("cluster"),
        F.col("a.dist").alias("dist"),
    )
    return (out, cents) if return_centroids else out
