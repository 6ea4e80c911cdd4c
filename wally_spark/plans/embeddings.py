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

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from wally_spark.plans.registry import register
from wally_spark.tables import load_tables

K = 8
ITERS = 4
# power-of-two lattice scale: quantization (v*GRID is exact in float64
# for float32 v) and the final sqrt(int)/GRID are both exact, so the
# Spark run and the DuckDB oracle agree bit-for-bit BY CONSTRUCTION,
# not empirically (r5 ADVICE: the float oracle's equality at argmin
# near-ties depended on accumulation order)
GRID = 1 << 20


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


def _kmeans_oracle() -> str:
    """DuckDB replication of lloyd_kmeans(grid=GRID), rounds unrolled
    as CTE chains (the ann_ivf technique, plans/similarity.py:
    _ivf_oracle): init = the K lowest vec_ids, each round = argmin
    assignment (ties to the lowest cluster, matching numpy argmin)
    then a per-(cluster, position) centroid update; after ITERS
    updates one final assignment emits (vec_id, cluster, dist_bp).

    Every intermediate is an EXACT int64 on the GRID lattice —
    quantization floor(x*GRID + 0.5) is exact (power-of-two GRID over
    float32 x), distances are integer sums, centroid means are floor
    divisions via the nonnegative-remainder identity (s - ((s % n) +
    n) % n is exactly divisible, so the engine's division semantics
    cannot matter). The only rounding anywhere is the final correctly-
    rounded sqrt of an exact integer, identical on any IEEE engine —
    agreement with Spark is by construction, not empirical."""
    cte = f"""
WITH comps AS (
  SELECT vec_id, u.i - 1 AS j,
         CAST(floor(u.x::DOUBLE * {GRID}.0 + 0.5) AS BIGINT) AS x
  FROM (SELECT vec_id, unnest(list_transform(embedding, (x, i) -> {{'x': x, 'i': i}})) AS u
        FROM embeddings)
),
init_ids AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cluster
  FROM embeddings ORDER BY vec_id LIMIT {K}
),
c0 AS (
  SELECT i.cluster, c.j AS p, c.x AS m
  FROM init_ids i JOIN comps c USING (vec_id)
)"""
    prev = "c0"
    for r in range(1, ITERS + 1):
        cte += f""",
d{r} AS (
  SELECT c.vec_id, k.cluster, sum((c.x - k.m) * (c.x - k.m)) AS d2
  FROM comps c JOIN {prev} k ON c.j = k.p
  GROUP BY c.vec_id, k.cluster
),
a{r} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rk
    FROM d{r}) WHERE rk = 1
),
m{r} AS (
  SELECT a.cluster, c.j AS p,
         CAST((sum(c.x) - ((sum(c.x) % count(*)) + count(*)) % count(*))
              / count(*) AS BIGINT) AS m
  FROM a{r} a JOIN comps c USING (vec_id)
  GROUP BY a.cluster, c.j
),
c{r} AS (
  SELECT k.cluster, k.p, coalesce(u.m, k.m) AS m
  FROM {prev} k LEFT JOIN m{r} u ON u.cluster = k.cluster AND u.p = k.p
)"""
        prev = f"c{r}"
    cte += f""",
dfin AS (
  SELECT c.vec_id, k.cluster, sum((c.x - k.m) * (c.x - k.m)) AS d2
  FROM comps c JOIN {prev} k ON c.j = k.p
  GROUP BY c.vec_id, k.cluster
)
SELECT vec_id, cluster,
       floor(10000.0 * (sqrt(d2) / {GRID}.0))::BIGINT AS dist_bp
FROM (
  SELECT vec_id, cluster, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rk
  FROM dfin) WHERE rk = 1
"""
    return cte


@register(
    "embedding_kmeans",
    oracle=_kmeans_oracle(),
    tags=("embeddings", "kmeans", "iterative"),
)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd's k-means (K=8, ITERS=4, init = the K
    lowest vec_ids): returns (vec_id, cluster, dist_bp). Iterative
    driver loop over distributed passes — assignment never shuffles
    (numpy matmul per Arrow batch against broadcast centroids);
    centroid update is one (cluster, pos) aggregate per round.
    Runs on the GRID integer lattice (r6): every cross-partition
    reduction is an exact int64 sum, so the answer is independent of
    partitioning/AQE/BLAS and the unrolled-CTE oracle is hash-exact by
    construction. pytest additionally gates determinism, full cluster
    coverage, and exact agreement with a single-process integer-grid
    numpy reference."""
    from wally_spark.operators.kmeans import lloyd_kmeans

    out = lloyd_kmeans(_emb(spark, sf_dir), k=K, iters=ITERS, grid=GRID)
    return out.select(
        "vec_id",
        "cluster",
        F.floor(10000.0 * F.col("dist")).cast("bigint").alias("dist_bp"),
    )
