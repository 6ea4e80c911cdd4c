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
from wally_spark.tables import fan_out, load_tables

K = 8
ITERS = 4
# power-of-two lattice scale: quantization (v*GRID is exact in float64
# for float32 v) and the final sqrt(int)/GRID are both exact, so the
# Spark run and the DuckDB oracle agree bit-for-bit BY CONSTRUCTION,
# not empirically (r5 ADVICE: the float oracle's equality at argmin
# near-ties depended on accumulation order)
GRID = 1 << 20


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no fan_out: see plans/similarity._emb (measured regression on the
    # Arrow/iterative embedding paths)
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


def _kmeans_cte_chain() -> str:
    """The shared unrolled-CTE chain replicating lloyd_kmeans(grid=
    GRID) up to ``dfin`` (per-vector distance to every final centroid)
    — the body both _kmeans_oracle and _semantic_dedup_oracle build
    on. Returned WITHOUT the ``WITH`` keyword or a final SELECT.

    Every intermediate is an EXACT int64 on the GRID lattice —
    quantization floor(x*GRID + 0.5) is exact (power-of-two GRID over
    float32 x), distances are integer sums, centroid means are floor
    divisions via the nonnegative-remainder identity (s - ((s % n) +
    n) % n is exactly divisible, so the engine's division semantics
    cannot matter). The only rounding anywhere is the final correctly-
    rounded sqrt of an exact integer, identical on any IEEE engine —
    agreement with Spark is by construction, not empirical."""
    cte = f"""comps AS (
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
)"""
    return cte


def _kmeans_oracle() -> str:
    return f"""
WITH {_kmeans_cte_chain()}
SELECT vec_id, cluster,
       floor(10000.0 * (sqrt(d2) / {GRID}.0))::BIGINT AS dist_bp
FROM (
  SELECT vec_id, cluster, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rk
  FROM dfin) WHERE rk = 1
"""


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


# --- sparse random projection (Johnson-Lindenstrauss) -----------------------
RP_DIMS = 8  # projected dimensionality


def _rp_sign_sql(j: int) -> str:
    """DuckDB sign expression for output dim ``j`` at input dim ``i``
    (1-based): first md5 nibble of "i:j" → {-1, 0, +1} with a SYMMETRIC
    5/6/5 split (P[-1] = P[+1] = 5/16, P[0] = 6/16) so E[sign] = 0 and
    no projected dim carries a systematic bias (Achlioptas-style sparse
    projection; r7 ADVICE fix — the old 5/5/6 split had E[sign]=1/16)."""
    nib = f"strpos('0123456789abcdef', substr(md5(i::VARCHAR || ':{j}'), 1, 1)) - 1"
    return f"CASE WHEN {nib} < 5 THEN -1 WHEN {nib} < 11 THEN 0 ELSE 1 END"


@register(
    "embedding_random_projection",
    oracle=f"""
WITH ex AS (
  SELECT vec_id, u.i AS i,
         CAST(floor(u.x::DOUBLE * {GRID}.0) AS BIGINT) AS q
  FROM (SELECT vec_id,
               unnest(list_transform(embedding, (x, i) -> {{'x': x, 'i': i}})) AS u
        FROM embeddings)
),
signs AS (
  SELECT i,
         {", ".join(f"{_rp_sign_sql(j)} AS s{j}" for j in range(RP_DIMS))}
  FROM (SELECT DISTINCT i FROM ex)
)
SELECT vec_id,
       {", ".join(f"sum(q * s{j})::BIGINT AS p{j}" for j in range(RP_DIMS))}
FROM ex JOIN signs USING (i)
GROUP BY vec_id
""",
    tags=("embeddings", "projection", "ann"),
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse sign random projection (Johnson-Lindenstrauss) of every
    embedding from its native dimensionality down to RP_DIMS — the
    dim-reduction step a pipeline runs before clustering / LSH / ANN
    when the raw embedding is too wide to shuffle economically.
    The projection matrix is never materialized globally: sign(i, j)
    is a pure function of the md5 nibble of "i:j" (Achlioptas-sparse,
    symmetric 5/16 density per nonzero sign so E[sign] = 0 — an
    asymmetric split would bias every projected dim by sum(q_i)/16),
    so every engine — and every executor — derives the identical
    matrix independently.

    Float discipline: components quantize ONCE onto the power-of-two
    GRID lattice (exact for float32 inputs, the embedding_kmeans
    lesson), after which the projection is exact int64 arithmetic —
    partition- and engine-independent by construction.

    Scale shape: posexplode → broadcast-join the (dim × RP_DIMS) sign
    table → one doc-keyed aggregate of RP_DIMS codegen sums with
    map-side combine. One shuffle keyed vec_id, carrying RP_DIMS
    partial sums per vector per task. The sign table spans MAX_DIM
    rows (the repo-wide embedding-width contract, plans/similarity.py
    MAX_DIM) built from spark.range — no data scan, no driver action;
    shorter vectors simply match fewer sign rows. r8 replaced the
    previous distinct-over-exploded-components derivation, which
    burned a full explode + shuffle pass on n_vec × dim rows just to
    learn `dim`. NULL components contribute 0 (dirty-corpus rule: a
    bad row degrades, never kills)."""
    emb = _emb(spark, sf_dir)
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("i0", "x")
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        F.coalesce(
            F.floor(F.col("x").cast("double") * float(GRID)).cast("bigint"),
            F.lit(0),
        ).alias("q"),
    )
    # Expressions as SQL strings, parsed server-side in one shot: the
    # functional-builder spelling of these 16 sign columns + 16 sums
    # cost ~0.4 s of py4j round trips PER PLAN BUILD (measured r8) —
    # identical logical plan, a fraction of the driver chatter.
    def _sign_sql(j: int) -> str:
        nib = (
            f"cast(conv(substring(md5(concat(cast(i as string), ':{j}')), "
            "1, 1), 16, 10) as int)"
        )
        return (
            f"case when {nib} < 5 then -1 when {nib} < 11 then 0 "
            f"else 1 end as s{j}"
        )

    from wally_spark.plans.similarity import MAX_DIM

    signs = (
        spark.range(1, MAX_DIM + 1)
        .selectExpr("cast(id as int) as i")
        .selectExpr("i", *[_sign_sql(j) for j in range(RP_DIMS)])
    )
    return (
        ex.join(F.broadcast(signs), "i")
        .groupBy("vec_id")
        .agg(
            *[
                F.expr(f"cast(sum(q * s{j}) as bigint)").alias(f"p{j}")
                for j in range(RP_DIMS)
            ]
        )
    )


# --- SemDeDup: semantic dedup at cluster granularity (r7) -------------------
SEM_TAU = 0.4  # within-cluster cosine threshold marking a semantic dup


def _semantic_dedup_oracle() -> str:
    return f"""
WITH {_kmeans_cte_chain()},
assign AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rk
    FROM dfin) WHERE rk = 1
),
v AS (
  SELECT a.vec_id, a.cluster, e.embedding
  FROM assign a JOIN embeddings e USING (vec_id)
),
prs AS (
  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM v x JOIN v y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
  WHERE list_cosine_similarity(x.embedding, y.embedding) > {SEM_TAU}
),
dup AS (SELECT vec_b, min(vec_a) AS dup_of FROM prs GROUP BY vec_b)
SELECT a.vec_id, a.cluster,
       (dup.dup_of IS NULL) AS keep,
       dup.dup_of
FROM assign a LEFT JOIN dup ON a.vec_id = dup.vec_b
"""


@register(
    "semantic_dedup",
    oracle=_semantic_dedup_oracle(),
    tags=("embeddings", "dedup", "kmeans"),
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication at CLUSTER
    granularity — k-means the embedding space, then compare vectors
    only WITHIN their cluster and drop all but one of each semantic-
    duplicate group. Composes the deterministic integer-grid Lloyd's
    assignment (operators/kmeans.py, same K/ITERS/GRID as
    embedding_kmeans) with within-cluster cosine scoring. Dup rule:
    vec i is dropped when ANY lower-id cluster-mate j has
    cos(i, j) > SEM_TAU (pair-graph dominance — deterministic and
    join-expressible; true greedy-sequential SemDeDup differs only on
    chains where an earlier dup shadows a later one, and is iterative).
    Output: (vec_id, cluster, keep, dup_of = the lowest-id dominating
    mate, NULL when kept).

    Scale shape: clustering makes the pair stage O(sum of cluster
    sizes squared), not O(n^2) — SemDeDup's entire point; at 100 TB, K
    scales with corpus size so n/K stays bounded. The scoring reuses
    dedup_embedding's triangle block join WITHIN each cluster: vectors
    hash into blocks sized by _n_embedding_blocks (each collect_list
    row stays ~4096 vectors regardless of corpus size), unordered
    block pairs join on (cluster, blk_a <= blk_b), and a numpy matmul
    scores each pair inside the task — no driver materialization, no
    cartesian (the join is cluster-equi-keyed). The kmeans assignment
    is pinned: it feeds both the block build and the final keep join."""
    import numpy as np
    import pandas as pd

    from wally_spark.operators.checkpoint import pin
    from wally_spark.operators.kmeans import lloyd_kmeans
    from wally_spark.plans.dedup import _n_embedding_blocks

    emb = _emb(spark, sf_dir)
    assign = pin(
        lloyd_kmeans(emb, k=K, iters=ITERS, grid=GRID).select("vec_id", "cluster")
    )
    nb = _n_embedding_blocks(emb.count())
    rows = emb.join(assign, "vec_id").select(
        "vec_id",
        "cluster",
        "embedding",
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(nb)).alias("blk"),
    )
    blocks = rows.groupBy("cluster", "blk").agg(
        F.collect_list("vec_id").alias("ids"),
        F.collect_list("embedding").alias("embs"),
    )
    a = blocks.select(
        "cluster", F.col("blk").alias("blk_a"), F.col("ids").alias("ids_a"),
        F.col("embs").alias("embs_a"),
    )
    b = blocks.select(
        F.col("cluster").alias("cluster_b"), F.col("blk").alias("blk_b"),
        F.col("ids").alias("ids_b"), F.col("embs").alias("embs_b"),
    )
    pair_rows = a.join(
        b, (F.col("cluster") == F.col("cluster_b")) & (F.col("blk_a") <= F.col("blk_b"))
    )

    def score(batches):
        empty = {
            "vec_a": np.array([], dtype=np.int64),
            "vec_b": np.array([], dtype=np.int64),
        }
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(empty)
                continue
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                ma = np.array([np.asarray(e, dtype=np.float64) for e in row.embs_a])
                mb = np.array([np.asarray(e, dtype=np.float64) for e in row.embs_b])
                ma = ma / np.linalg.norm(ma, axis=1, keepdims=True)
                mb = mb / np.linalg.norm(mb, axis=1, keepdims=True)
                cos = ma @ mb.T
                ai, bi = np.where(cos > SEM_TAU)
                if row.blk_a == row.blk_b:
                    keep = ids_a[ai] != ids_b[bi]
                else:
                    keep = np.ones(len(ai), dtype=bool)
                ai, bi = ai[keep], bi[keep]
                ia, ib = ids_a[ai], ids_b[bi]
                yield pd.DataFrame(
                    {
                        "vec_a": np.minimum(ia, ib),
                        "vec_b": np.maximum(ia, ib),
                    }
                )

    pairs = pair_rows.mapInPandas(score, "vec_a bigint, vec_b bigint")
    dup = pairs.groupBy("vec_b").agg(F.min("vec_a").alias("dup_of"))
    return assign.join(dup, assign.vec_id == dup.vec_b, "left").select(
        "vec_id",
        "cluster",
        F.col("dup_of").isNull().alias("keep"),
        "dup_of",
    )


# --- power-iteration PCA: top principal direction (r7) ----------------------
PCA_NIB_SPLIT = 8  # md5-nibble threshold for the +/-1 init vector


def _pca_oracle() -> str:
    """Unrolled 2-round power iteration on the integer lattice (same
    CTE-chain technique as _kmeans_cte_chain)."""
    nib = "strpos('0123456789abcdef', substr(md5(i::VARCHAR), 1, 1)) - 1"
    return f"""
WITH ex AS (
  SELECT vec_id, u.i AS i,
         CAST(floor(u.x::DOUBLE * {GRID}.0) AS BIGINT) AS q
  FROM (SELECT vec_id,
               unnest(list_transform(embedding, (x, i) -> {{'x': x, 'i': i}})) AS u
        FROM embeddings)
),
signs AS (
  SELECT i, CASE WHEN {nib} < {PCA_NIB_SPLIT} THEN -1 ELSE 1 END AS s
  FROM (SELECT DISTINCT i FROM ex)
),
y AS (SELECT vec_id, sum(q * s)::BIGINT AS y
      FROM ex JOIN signs USING (i) GROUP BY vec_id),
dy AS (SELECT (max(abs(y)) // {GRID} + 1)::BIGINT AS d FROM y),
ys AS (SELECT vec_id, (y // d)::BIGINT AS ys FROM y CROSS JOIN dy),
v1 AS (SELECT i, sum(q * ys)::BIGINT AS v
       FROM ex JOIN ys USING (vec_id) GROUP BY i),
d1 AS (SELECT (max(abs(v)) // {GRID} + 1)::BIGINT AS d FROM v1),
v1s AS (SELECT i, (v // d)::BIGINT AS vs FROM v1 CROSS JOIN d1),
z AS (SELECT vec_id, sum(q * vs)::BIGINT AS z
      FROM ex JOIN v1s USING (i) GROUP BY vec_id),
dz AS (SELECT (max(abs(z)) // {GRID} + 1)::BIGINT AS d FROM z),
zs AS (SELECT vec_id, (z // d)::BIGINT AS zs FROM z CROSS JOIN dz),
v2 AS (SELECT i, sum(q * zs)::BIGINT AS v
       FROM ex JOIN zs USING (vec_id) GROUP BY i),
d2 AS (SELECT (max(abs(v)) // {GRID} + 1)::BIGINT AS d FROM v2)
SELECT i::BIGINT AS pos, (v // d)::BIGINT AS loading
FROM v2 CROSS JOIN d2
"""


@register(
    "embedding_pca_power",
    oracle=_pca_oracle(),
    tags=("embeddings", "pca", "iterative"),
)
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the (uncentered) embedding matrix by
    TWO unrolled power-iteration rounds — v ← Xᵀ(Xv) twice from a
    deterministic ±1 seed — the dim-importance diagnostic (and
    whitening precursor) a pipeline runs before deciding what a
    projection may drop. Uncentered on purpose: centering would break
    the exact integer lattice, and for the dominant direction the
    mean term is a rank-one perturbation the diagnostic tolerates.

    Float discipline: components quantize ONCE onto the power-of-two
    GRID lattice; every subsequent product/sum is int64, and each
    half-step rescales by a max-abs-derived divisor (``max|v|//GRID+1``,
    integer division — truncation agrees between engines) so values
    stay ≤~2²⁰ and products stay far from int64 overflow (safe to
    ~1e8 vectors; beyond that, add one more rescale on the vector
    side). The result is partition- and engine-exact BY CONSTRUCTION —
    the same lattice contract as embedding_kmeans.

    Scale shape: Xv is a vec_id-keyed aggregate over the exploded
    (vec_id, i, q) relation; Xᵀy joins the n-row y vector back on
    vec_id (co-keyed shuffle) and aggregates on i — map-side combined
    both ways; the dim-sized v relations (64 rows) broadcast to the
    next round; the four rescale divisors are 1-row broadcast sides.
    No driver-side state at all — unlike MLlib's PCA (driver Gramian),
    this stays distributed end-to-end. The exploded base relation and
    each rescaled half-step output are PINNED (operators/checkpoint.pin,
    the graph_pagerank contract): without lineage truncation each stage
    re-expands everything upstream and the physical plan doubles per
    half-step (measured: 92 parquet scans for 2 rounds) — harmless on a
    one-file local table, fatal at 100 TB."""
    from wally_spark.operators.checkpoint import pin

    emb = _emb(spark, sf_dir)
    ex = pin(
        emb.select(
            "vec_id", F.posexplode("embedding").alias("i0", "x")
        ).select(
            "vec_id",
            (F.col("i0") + 1).alias("i"),
            F.coalesce(
                F.floor(F.col("x").cast("double") * float(GRID)).cast("bigint"),
                F.lit(0),
            ).alias("q"),
        )
    )
    nib = F.conv(
        F.substring(F.md5(F.col("i").cast("string")), 1, 1), 16, 10
    ).cast("int")
    signs = ex.select("i").distinct().select(
        "i",
        F.when(nib < PCA_NIB_SPLIT, F.lit(-1)).otherwise(F.lit(1)).alias("s"),
    )

    def _rescale(df: DataFrame, col: str, out: str) -> DataFrame:
        d = df.agg(
            (F.expr(f"max(abs({col})) div {GRID}") + 1)
            .cast("bigint")
            .alias("d")
        )
        return df.crossJoin(F.broadcast(d)).select(
            *[c for c in df.columns if c != col],
            F.expr(f"{col} div d").cast("bigint").alias(out),
        )

    y = (
        ex.join(F.broadcast(signs), "i")
        .groupBy("vec_id")
        .agg(F.sum(F.col("q") * F.col("s")).cast("bigint").alias("y"))
    )
    ys = pin(_rescale(y, "y", "ys"))
    v1 = (
        ex.join(ys, "vec_id")
        .groupBy("i")
        .agg(F.sum(F.col("q") * F.col("ys")).cast("bigint").alias("v"))
    )
    v1s = pin(_rescale(v1, "v", "vs"))
    z = (
        ex.join(F.broadcast(v1s), "i")
        .groupBy("vec_id")
        .agg(F.sum(F.col("q") * F.col("vs")).cast("bigint").alias("z"))
    )
    zs = pin(_rescale(z, "z", "zs"))
    v2 = (
        ex.join(zs, "vec_id")
        .groupBy("i")
        .agg(F.sum(F.col("q") * F.col("zs")).cast("bigint").alias("v"))
    )
    return _rescale(v2, "v", "loading").select(
        F.col("i").cast("bigint").alias("pos"), "loading"
    )


# --- embedding QC report ------------------------------------------------------
@register(
    "embedding_norm_report",
    oracle="""
WITH q AS (
  SELECT vec_id, label,
         list_aggregate(
           list_transform(embedding,
                          x -> (floor(10000 * x::DOUBLE)::BIGINT
                                * floor(10000 * x::DOUBLE)::BIGINT)),
           'sum')::BIGINT AS sumsq_q,
         len(list_filter(embedding, x -> x = 0.0))::BIGINT AS n_zero,
         len(embedding)::BIGINT AS dim
  FROM embeddings)
SELECT vec_id, label, sumsq_q, n_zero, dim,
       floor(sqrt(sumsq_q::DOUBLE) / 10)::BIGINT AS norm_milli,
       CASE WHEN sumsq_q = 0 THEN 'zero'
            WHEN floor(sqrt(sumsq_q::DOUBLE) / 10) < 500 THEN 'short'
            WHEN floor(sqrt(sumsq_q::DOUBLE) / 10) > 2000 THEN 'long'
            ELSE 'normal' END AS band
FROM q
""",
    tags=("embedding", "quality"),
)
def embedding_norm_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QC gate: per-vector L2 norm, zero-element count, and
    a degenerate/outlier band — the sanity pass a training pipeline
    runs before ANN indexing or semantic dedup (zero/short vectors
    poison cosine math; abnormally long ones dominate centroids).

    Arithmetic: elements are integerized once (floor(1e4·x)) and the
    squared sum is an associative bigint, so the hash is exact under
    any partitioning; the single sqrt per vector is IEEE-deterministic
    on both engines. One scan, all higher-order-function codegen, zero
    UDFs, embarrassingly parallel — at 100 TB this is a map-only pass
    that pushes only the embedding column through the scan."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    sumsq = F.expr(
        "aggregate(transform(embedding,"
        " x -> CAST(floor(10000 * x) AS BIGINT)"
        "      * CAST(floor(10000 * x) AS BIGINT)),"
        " 0L, (acc, v) -> acc + v)"
    )
    q = emb.select(
        "vec_id",
        "label",
        sumsq.alias("sumsq_q"),
        F.size(F.filter(F.col("embedding"), lambda x: x == 0.0))
        .cast("bigint")
        .alias("n_zero"),
        F.size("embedding").cast("bigint").alias("dim"),
    )
    norm_milli = F.floor(F.sqrt(F.col("sumsq_q").cast("double")) / 10).cast(
        "bigint"
    )
    band = (
        F.when(F.col("sumsq_q") == 0, "zero")
        .when(norm_milli < 500, "short")
        .when(norm_milli > 2000, "long")
        .otherwise("normal")
    )
    return q.select(
        "vec_id", "label", "sumsq_q", "n_zero", "dim",
        norm_milli.alias("norm_milli"), band.alias("band"),
    )


@register(
    "embedding_dim_stats",
    oracle="""
WITH comps AS (
  SELECT u.i - 1 AS dim,
         floor(10000 * u.x::DOUBLE)::BIGINT AS q,
         CASE WHEN u.x = 0.0 THEN 1 ELSE 0 END AS z
  FROM (SELECT unnest(list_transform(embedding,
                                     (x, i) -> {'x': x, 'i': i})) AS u
        FROM embeddings))
SELECT dim::BIGINT AS dim,
       count(*)::BIGINT AS n_vecs,
       sum(q)::BIGINT AS sum_q,
       sum(q * q)::BIGINT AS sumsq_q,
       min(q)::BIGINT AS min_q,
       max(q)::BIGINT AS max_q,
       sum(z)::BIGINT AS n_zero
FROM comps GROUP BY dim
""",
    tags=("embedding", "quality"),
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION embedding statistics (embedding_norm_report is
    the per-vector face): each coordinate's count, exact integer sum /
    sum-of-squares on the 1e-4 lattice, range, and zero count — the
    feature-health report behind whitening decisions and dead-dimension
    detection (a dimension that is ~always zero wastes index space;
    one with huge variance dominates unnormalized distances).

    Scale shape: posexplode in the scan stage feeding ONE map-side-
    combined aggregate keyed by dimension — output is |dims| rows no
    matter the corpus size, and the shuffle carries dims × partitions
    partial rows. Same floor(1e4·x) integerization as the norm report,
    so the two QC lanes quantize identically; all-bigint, hash-exact."""
    emb = _emb(spark, sf_dir)
    q = F.floor(10000 * F.col("v").cast("double")).cast("bigint")
    return (
        emb.select(F.posexplode("embedding").alias("p", "v"))
        .select(
            F.col("p").cast("bigint").alias("dim"),
            q.alias("q"),
            F.when(F.col("v") == 0.0, 1).otherwise(0).alias("z"),
        )
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum("q").cast("bigint").alias("sum_q"),
            F.sum(F.col("q") * F.col("q")).cast("bigint").alias("sumsq_q"),
            F.min("q").cast("bigint").alias("min_q"),
            F.max("q").cast("bigint").alias("max_q"),
            F.sum("z").cast("bigint").alias("n_zero"),
        )
    )


# --- per-label centroid-distance outliers (r8) -------------------------------
OUTLIER_FACTOR = 4  # flag vectors with d2 > OUTLIER_FACTOR * label mean d2


@register(
    "embedding_outliers",
    oracle=f"""
WITH comps AS (
  SELECT vec_id, label, u.i - 1 AS j,
         CAST(floor(u.x::DOUBLE * {GRID}.0 + 0.5) AS BIGINT) AS x
  FROM (SELECT vec_id, label,
               unnest(list_transform(embedding, (x, i) -> {{'x': x, 'i': i}})) AS u
        FROM embeddings)
),
cent AS (
  SELECT label, j,
         (sum(x) - ((sum(x) % count(*)) + count(*)) % count(*)) // count(*)
           AS m
  FROM comps GROUP BY label, j
),
d AS (
  SELECT c.vec_id, c.label, sum((c.x - k.m) * (c.x - k.m)) AS d2
  FROM comps c JOIN cent k ON c.label = k.label AND c.j = k.j
  GROUP BY c.vec_id, c.label
),
stats AS (
  SELECT label, count(*) AS n, sum(d2) AS sum_d2 FROM d GROUP BY label
)
SELECT d.vec_id, d.label, d.d2::BIGINT AS d2,
       (stats.n * d.d2 > {OUTLIER_FACTOR} * stats.sum_d2) AS is_outlier
FROM d JOIN stats ON d.label = stats.label
""",
    tags=("embeddings", "quality", "outlier"),
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outlier detection — the mislabeled-example /
    contamination probe an embedding-QC pass runs (a vector far from
    its own class centroid is a labeling error, an out-of-distribution
    doc, or an encoder failure): squared distance to the label
    centroid, flagged when OUTLIER_FACTOR× above the label's mean
    squared distance (the cross-multiplied integer form of the z-ish
    rule — no float division anywhere).

    Exactness by construction (the embedding_kmeans lattice contract):
    components quantize to the GRID lattice (exact for power-of-two
    GRID over float32), centroid means are exact floor divisions via
    the nonnegative-remainder identity, distances are exact int64
    sums — order-independent, so Spark and DuckDB agree bit-for-bit
    under any partitioning.

    Scale shape: posexplode + (label, pos) aggregate for centroids
    (map-side combined, output labels × dim — dimension-sized,
    BROADCAST back), per-vector d2 re-aggregates the same exploded
    rows keyed by vec_id (components of a vector are adjacent in the
    scan partition, so map-side combine collapses them before the
    shuffle: one row per vector), one labels-bounded stats join."""
    emb = _emb(spark, sf_dir)
    comps = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("j", "v"),
    ).select(
        "vec_id",
        "label",
        "j",
        F.floor(F.col("v").cast("double") * GRID + F.lit(0.5))
        .cast("bigint")
        .alias("x"),
    )
    cent = comps.groupBy("label", "j").agg(
        F.expr(
            "(sum(x) - ((sum(x) % count(1)) + count(1)) % count(1))"
            " div count(1)"
        ).alias("m")
    )
    d = (
        comps.join(F.broadcast(cent), ["label", "j"])
        .select(
            "vec_id",
            "label",
            ((F.col("x") - F.col("m")) * (F.col("x") - F.col("m"))).alias(
                "sq"
            ),
        )
        .groupBy("vec_id", "label")
        .agg(F.sum("sq").alias("d2"))
    )
    stats = d.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("d2").alias("sum_d2")
    )
    return d.join(F.broadcast(stats), "label").select(
        "vec_id",
        "label",
        F.col("d2").cast("bigint").alias("d2"),
        (F.col("n") * F.col("d2") > OUTLIER_FACTOR * F.col("sum_d2")).alias(
            "is_outlier"
        ),
    )


# --- pairwise-cosine histogram (r8) ------------------------------------------
PAIR_STRIDES = (1, 13, 177)  # deterministic id-lag pair samples
PAIR_BIN_BP = 500  # histogram bin width in cosine basis points


@register(
    "embedding_pair_hist",
    oracle=f"""
WITH pairs AS (
  {" UNION ALL ".join(
    f'''SELECT {s} AS stride,
        floor(10000.0 * list_cosine_similarity(a.embedding, b.embedding))
          ::BIGINT AS cos_bp
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + {s}'''
    for s in PAIR_STRIDES
  )}
),
binned AS (
  SELECT stride, CAST(floor(cos_bp / {PAIR_BIN_BP}.0) AS BIGINT) AS bin,
         cos_bp
  FROM pairs)
SELECT stride, bin, (bin * {PAIR_BIN_BP})::BIGINT AS bin_lo_bp,
       count(*)::BIGINT AS n_pairs,
       CAST(floor(sum(cos_bp) / count(*)) AS BIGINT) AS mean_cos_bp,
       ((10000 * count(*)) //
        sum(count(*)) OVER (PARTITION BY stride))::BIGINT AS share_bp
FROM binned GROUP BY stride, bin
""",
    tags=("embedding", "quality"),
)
def embedding_pair_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine histogram — the embedding-space collapse /
    anisotropy QC gate (Ethayarajh 2019 shape): sample pairs
    DETERMINISTICALLY by id lag (vec i with vec i+stride, three
    strides, so reruns and the oracle see the exact same pair set —
    never a random sample), bin each pair's cosine into PAIR_BIN_BP
    buckets, and report per (stride, bin) the count, in-bin mean, and
    per-stride share. A healthy space piles mass near 0; mass piled
    near 10000 across strides means the encoder collapsed. Cosine is
    the float path ann_bruteforce already proved hash-exact against
    DuckDB's list_cosine_similarity; bin edges divide by the bin
    width in float (exactly-representable quotients at bin
    boundaries), so bucketing is identical on both engines.

    Scale shape: each stride is ONE equi-join keyed on vec_id (no
    similarity search, no self-cartesian — the join fans out 1:1),
    unioned, then a (stride, bin)-keyed aggregate, map-side combined;
    the share window runs over the |strides| × ~41-bin bounded
    aggregate output. Corpus shuffles once per stride on a uniform
    bigint key."""
    from wally_spark.plans.similarity import _cos

    emb = _emb(spark, sf_dir)
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    per_stride = [
        a.join(b, F.col("ib") == F.col("ia") + F.lit(int(s)))
        .select(
            F.lit(int(s)).alias("stride"),
            F.floor(10000.0 * _cos(F.col("ea"), F.col("eb")))
            .cast("bigint")
            .alias("cos_bp"),
        )
        for s in PAIR_STRIDES
    ]
    pairs = per_stride[0]
    for p in per_stride[1:]:
        pairs = pairs.unionAll(p)
    binned = pairs.select(
        "stride",
        F.floor(F.col("cos_bp") / float(PAIR_BIN_BP)).cast("bigint").alias("bin"),
        "cos_bp",
    )
    from pyspark.sql import Window

    share_w = Window.partitionBy("stride")
    return (
        binned.groupBy("stride", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("cos_bp").alias("_sum"),
        )
        .select(
            "stride",
            "bin",
            (F.col("bin") * PAIR_BIN_BP).cast("bigint").alias("bin_lo_bp"),
            "n_pairs",
            F.floor(F.col("_sum") / F.col("n_pairs"))
            .cast("bigint")
            .alias("mean_cos_bp"),
            F.floor(
                (10000 * F.col("n_pairs")) / F.sum("n_pairs").over(share_w)
            )
            .cast("bigint")
            .alias("share_bp"),
        )
    )


# --- cross-modal dup/embedding consistency audit (r8) ------------------------
CONSISTENT_COS_BP = 5000  # template cohorts should embed coherently
PREFIX_TOKENS = 3  # normalized leading-token cohort key (CCNet-style)


@register(
    "dup_embedding_consistency",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, source,
         array_to_string(list_slice(
           list_filter(string_split(lower(text), ' '), x -> x <> ''),
           1, {PREFIX_TOKENS}), ' ') AS h
  FROM documents),
g AS (
  SELECT h, min(doc_id) AS keeper, count(*) AS n
  FROM keyed GROUP BY h HAVING count(*) > 1),
pairs AS (
  SELECT g.keeper, k.doc_id AS member, k.source
  FROM g JOIN keyed k ON k.h = g.h
  WHERE k.doc_id <> g.keeper),
scored AS (
  SELECT p.source,
         floor(10000.0 * list_cosine_similarity(ea.embedding, eb.embedding))
           ::BIGINT AS cos_bp
  FROM pairs p
  JOIN embeddings ea ON ea.vec_id = p.keeper
  JOIN embeddings eb ON eb.vec_id = p.member)
SELECT source,
       count(*)::BIGINT AS n_pairs,
       sum(CASE WHEN cos_bp >= {CONSISTENT_COS_BP} THEN 1 ELSE 0 END)::BIGINT
         AS n_consistent,
       min(cos_bp)::BIGINT AS min_cos_bp,
       (sum(cos_bp) // count(*))::BIGINT AS mean_cos_bp,
       ((10000 * sum(CASE WHEN cos_bp >= {CONSISTENT_COS_BP}
                          THEN 1 ELSE 0 END)) // count(*))::BIGINT
         AS consistent_bp
FROM scored GROUP BY source
""",
    tags=("embedding", "dedup", "quality"),
)
def dup_embedding_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal pipeline audit: documents sharing a normalized
    leading-PREFIX_TOKENS-token prefix (template/boilerplate cohorts —
    the CCNet-style near-dup key; the exact md5 key degenerates to
    singletons on corpora with no verbatim copies, which would make
    the audit vacuous) should embed coherently. Scattered cosines
    inside a template cohort mean the encoder is unstable (dropout
    left on, version skew across workers) or the doc↔vector id
    mapping is corrupted. Per source: cohort pairs checked, pairs at
    or above CONSISTENT_COS_BP, the worst and mean cosine, and the
    coherence rate bp.

    Scale shape: cohorts via one prefix-keyed aggregate; pairing is
    STAR (every member against the cohort keeper), so pair count is
    LINEAR in cohort size — never the quadratic all-pairs a naive
    within-group self-join plans; embeddings attach via two vec_id
    equi-joins (uniform keys); the report is |sources|-bounded. The
    cosine is the float path ann_bruteforce proved hash-exact against
    DuckDB."""
    from wally_spark.plans.similarity import _cos

    t = load_tables(spark, sf_dir)
    docs, emb = t["documents"], t["embeddings"]
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    keyed = docs.select(
        "doc_id",
        "source",
        F.concat_ws(" ", F.slice(words, 1, PREFIX_TOKENS)).alias("h"),
    )
    g = (
        keyed.groupBy("h")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .select("h", "keeper")
    )
    pairs = (
        keyed.join(g, "h")
        .where(F.col("doc_id") != F.col("keeper"))
        .select("keeper", F.col("doc_id").alias("member"), "source")
    )
    ea = emb.select(F.col("vec_id").alias("keeper"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("member"), F.col("embedding").alias("eb"))
    scored = (
        pairs.join(ea, "keeper")
        .join(eb, "member")
        .select(
            "source",
            F.floor(10000.0 * _cos(F.col("ea"), F.col("eb")))
            .cast("bigint")
            .alias("cos_bp"),
        )
    )
    consistent = (F.col("cos_bp") >= CONSISTENT_COS_BP).cast("bigint")
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(consistent).cast("bigint").alias("n_consistent"),
        F.min("cos_bp").cast("bigint").alias("min_cos_bp"),
        F.expr("sum(cos_bp) div count(1)").cast("bigint").alias("mean_cos_bp"),
        F.expr(
            f"10000 * sum(cast(cos_bp >= {CONSISTENT_COS_BP} as bigint))"
            " div count(1)"
        )
        .cast("bigint")
        .alias("consistent_bp"),
    )


# --- k-means cluster balance / inertia report (r8) ---------------------------
def _cluster_balance_oracle() -> str:
    return f"""
WITH {_kmeans_cte_chain()},
assigned AS (
  SELECT vec_id, cluster, floor(10000.0 * (sqrt(d2) / {GRID}.0))::BIGINT
           AS dist_bp
  FROM (
    SELECT vec_id, cluster, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rk
    FROM dfin) WHERE rk = 1),
per AS (
  SELECT cluster, count(*)::BIGINT AS n_vecs,
         (sum(dist_bp) // count(*))::BIGINT AS mean_dist_bp,
         max(dist_bp)::BIGINT AS max_dist_bp
  FROM assigned GROUP BY cluster),
t AS (SELECT sum(n_vecs)::BIGINT AS total FROM per)
SELECT cluster, n_vecs,
       ((10000 * n_vecs) // total)::BIGINT AS share_bp,
       mean_dist_bp, max_dist_bp
FROM per, t
"""


@register(
    "embedding_cluster_balance",
    oracle=_cluster_balance_oracle(),
    tags=("embeddings", "kmeans", "quality"),
)
def embedding_cluster_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-health report over the embedding_kmeans partition (same
    K/ITERS/GRID/init, so the two lanes describe the SAME clustering):
    per cluster, member count, corpus share bp, and mean/max
    centroid-distance bp — the report that catches a collapsed
    clustering (one giant cluster = embedding collapse; empty or
    near-empty clusters = bad init or over-provisioned K) before an
    IVF index or a SemDeDup pass builds on it.

    Scale shape: the clustering is the distributed integer-lattice
    Lloyd's pass (broadcast centroids, matmul assignment, no
    per-round shuffle of raw vectors); this lane adds one K-group
    map-side-combined aggregate + a scalar-total broadcast onto K
    rows. Integer dist_bp means the means are exact int64 divisions
    — hash-stable under any partitioning."""
    from wally_spark.operators.kmeans import lloyd_kmeans

    out = lloyd_kmeans(_emb(spark, sf_dir), k=K, iters=ITERS, grid=GRID)
    assigned = out.select(
        "cluster",
        F.floor(10000.0 * F.col("dist")).cast("bigint").alias("dist_bp"),
    )
    per = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.expr("CAST(sum(dist_bp) div count(1) AS BIGINT)").alias(
            "mean_dist_bp"
        ),
        F.max("dist_bp").cast("bigint").alias("max_dist_bp"),
    )
    t = per.agg(F.sum("n_vecs").alias("total"))
    return per.crossJoin(F.broadcast(t)).selectExpr(
        "cluster", "n_vecs",
        "CAST((10000 * n_vecs) div total AS BIGINT) AS share_bp",
        "mean_dist_bp", "max_dist_bp",
    )


# --- greedy k-center coreset selection (r9) ----------------------------------
@register(
    "embedding_kcenter",
    oracle=f"""
WITH comps AS (
  SELECT vec_id, u.i - 1 AS j,
         CAST(floor(u.x::DOUBLE * {GRID}.0 + 0.5) AS BIGINT) AS x
  FROM (SELECT vec_id, unnest(list_transform(embedding, (x, i) -> {{'x': x, 'i': i}})) AS u
        FROM embeddings)
),
s1 AS (SELECT min(vec_id) AS c FROM embeddings),
cc1 AS (SELECT 1 AS cid, j, x AS m FROM comps JOIN s1 ON vec_id = c),
dm2 AS (
  SELECT vec_id, min(sd) AS dmin FROM (
    SELECT c.vec_id, k.cid, sum((c.x - k.m) * (c.x - k.m)) AS sd
    FROM comps c JOIN cc1 k USING (j)
    GROUP BY c.vec_id, k.cid)
  GROUP BY vec_id),
p2 AS (SELECT vec_id, dmin FROM dm2 ORDER BY dmin DESC, vec_id LIMIT 1),
cc2 AS (
  SELECT * FROM cc1
  UNION ALL
  SELECT 2 AS cid, c.j, c.x FROM comps c JOIN p2 USING (vec_id)),
dm3 AS (
  SELECT vec_id, min(sd) AS dmin FROM (
    SELECT c.vec_id, k.cid, sum((c.x - k.m) * (c.x - k.m)) AS sd
    FROM comps c JOIN cc2 k USING (j)
    GROUP BY c.vec_id, k.cid)
  GROUP BY vec_id),
p3 AS (SELECT vec_id, dmin FROM dm3 ORDER BY dmin DESC, vec_id LIMIT 1),
cc3 AS (
  SELECT * FROM cc2
  UNION ALL
  SELECT 3 AS cid, c.j, c.x FROM comps c JOIN p3 USING (vec_id)),
dm4 AS (
  SELECT vec_id, min(sd) AS dmin FROM (
    SELECT c.vec_id, k.cid, sum((c.x - k.m) * (c.x - k.m)) AS sd
    FROM comps c JOIN cc3 k USING (j)
    GROUP BY c.vec_id, k.cid)
  GROUP BY vec_id),
p4 AS (SELECT vec_id, dmin FROM dm4 ORDER BY dmin DESC, vec_id LIMIT 1),
cc4 AS (
  SELECT * FROM cc3
  UNION ALL
  SELECT 4 AS cid, c.j, c.x FROM comps c JOIN p4 USING (vec_id)),
dm5 AS (
  SELECT vec_id, min(sd) AS dmin FROM (
    SELECT c.vec_id, k.cid, sum((c.x - k.m) * (c.x - k.m)) AS sd
    FROM comps c JOIN cc4 k USING (j)
    GROUP BY c.vec_id, k.cid)
  GROUP BY vec_id),
p5 AS (SELECT vec_id, dmin FROM dm5 ORDER BY dmin DESC, vec_id LIMIT 1)
SELECT 1::BIGINT AS round, c::BIGINT AS center_vec, 0::BIGINT AS sel_d2 FROM s1
UNION ALL
SELECT 2::BIGINT, vec_id::BIGINT, dmin::BIGINT FROM p2
UNION ALL
SELECT 3::BIGINT, vec_id::BIGINT, dmin::BIGINT FROM p3
UNION ALL
SELECT 4::BIGINT, vec_id::BIGINT, dmin::BIGINT FROM p4
UNION ALL
SELECT 5::BIGINT, vec_id::BIGINT, dmin::BIGINT FROM p5
ORDER BY round""",
    tags=("embeddings", "coreset", "iterative"),
)
def embedding_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 2-approximation —
    the farthest-point sampler behind coreset/active-learning data
    curation): seed with the min vec_id, then 3 rounds of "select the
    vector farthest from the chosen set"; the 5th row probes the
    NEXT farthest point, i.e. the coverage radius of the selected
    4-set. Emits (round, center_vec, sel_d2).

    Exactness: the kmeans discipline — components quantize to the
    2^20 grid (exact for float32 in [-1,1]), distances are exact int64
    sums (16 dims x (2*2^20)^2 = 7*10^13 < 2^63 headroom through
    512 dims), argmax is (d2 DESC, vec_id) — no floats anywhere, so
    the unrolled-CTE oracle agrees by construction.

    Scale shape per round: comps joins the <= 4x|dims|-row center
    relation BROADCAST, one vec-keyed min aggregate (map-side
    combined), one TakeOrdered 1-row argmax — never a global sort,
    never a driver collect; the plan is one lazy DAG. Deliberately NOT
    pinned: eight consumers re-derive the posexplode across rounds,
    but an A/B measured pin(comps) SLOWER at sf0.1 (4.19 vs 3.87 s
    min-of-3 — materialization cost exceeds the codegen recompute; the
    r8 graph-lane lesson). At cluster scale with a fat embedding
    table, pin(comps) is the one-line flip."""
    emb = _emb(spark, sf_dir)
    comps = emb.select(
        "vec_id", F.posexplode("embedding").alias("j", "xf")
    ).select(
        "vec_id",
        "j",
        F.floor(F.col("xf").cast("double") * float(GRID) + 0.5)
        .cast("bigint")
        .alias("x"),
    )
    seed = emb.agg(F.min("vec_id").alias("c"))
    cc = comps.join(
        F.broadcast(seed), F.col("vec_id") == F.col("c")
    ).select(F.lit(1).alias("cid"), "j", F.col("x").alias("m"))
    rows = [
        seed.select(
            F.lit(1).cast("bigint").alias("round"),
            F.col("c").cast("bigint").alias("center_vec"),
            F.lit(0).cast("bigint").alias("sel_d2"),
        )
    ]
    for r in range(2, 6):
        sd = (
            comps.join(F.broadcast(cc), "j")
            .groupBy("vec_id", "cid")
            .agg(F.sum((F.col("x") - F.col("m")) * (F.col("x") - F.col("m"))).alias("sd"))
        )
        dm = sd.groupBy("vec_id").agg(F.min("sd").alias("dmin"))
        pick = dm.orderBy(F.desc("dmin"), "vec_id").limit(1)
        rows.append(
            pick.select(
                F.lit(r).cast("bigint").alias("round"),
                F.col("vec_id").cast("bigint").alias("center_vec"),
                F.col("dmin").cast("bigint").alias("sel_d2"),
            )
        )
        if r < 5:
            cc = cc.unionByName(
                comps.join(
                    F.broadcast(pick.select("vec_id")), "vec_id", "left_semi"
                ).select(F.lit(r).alias("cid"), "j", F.col("x").alias("m"))
            )
    out = rows[0]
    for d in rows[1:]:
        out = out.unionByName(d)
    return out.orderBy("round")


# --- simplified silhouette of the labeled clustering (r9) --------------------
@register(
    "embedding_silhouette",
    oracle=f"""
WITH comps AS (
  SELECT vec_id, u.i - 1 AS j,
         CAST(floor(u.x::DOUBLE * {GRID}.0 + 0.5) AS BIGINT) AS x
  FROM (SELECT vec_id, unnest(list_transform(embedding, (x, i) -> {{'x': x, 'i': i}})) AS u
        FROM embeddings)
),
lab AS (SELECT vec_id, label FROM embeddings),
cent AS (
  SELECT l.label, c.j,
         ((sum(c.x) - ((sum(c.x) % count(*)) + count(*)) % count(*))
          / count(*))::BIGINT AS m
  FROM comps c JOIN lab l USING (vec_id)
  GROUP BY l.label, c.j),
dv AS (
  SELECT c.vec_id, k.label AS clabel, sum((c.x - k.m) * (c.x - k.m)) AS d2
  FROM comps c JOIN cent k USING (j)
  GROUP BY c.vec_id, k.label),
ab AS (
  SELECT d.vec_id, l.label,
         max(CASE WHEN d.clabel = l.label THEN d.d2 END) AS a2,
         min(CASE WHEN d.clabel <> l.label THEN d.d2 END) AS b2
  FROM dv d JOIN lab l USING (vec_id)
  GROUP BY d.vec_id, l.label),
sil AS (
  SELECT label, vec_id,
         ((1000 * (b2 - a2)) // greatest(a2, b2, 1))::BIGINT AS s_milli
  FROM ab)
SELECT label,
       count(*)::BIGINT AS n_vecs,
       (sum(s_milli) // count(*))::BIGINT AS avg_sil_milli,
       sum(CASE WHEN s_milli < 0 THEN 1 ELSE 0 END)::BIGINT AS n_negative
FROM sil GROUP BY label ORDER BY label
""",
    tags=("embeddings", "clustering", "quality"),
)
def embedding_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette of the LABELED clustering — the
    label-quality audit before trusting `label` for stratification or
    semantic dedup cells: per vector, a = squared distance to its own
    label centroid, b = min squared distance to any other centroid,
    s = (b-a)/max(a,b) in millis; per label, the mean silhouette and
    the count of negative-silhouette vectors (closer to a foreign
    centroid than their own — candidate mislabels).

    Exactness: kmeans-lane discipline — grid-quantized components,
    centroid means by the nonnegative-remainder exact-division
    identity, distances exact int64, one truncating division per
    vector (both engines truncate toward zero).

    Scale shape: one label-keyed centroid aggregate (|labels|×|dims|
    rows, BROADCAST back), one vec-keyed distance aggregate, a
    |labels|-bounded rollup. No pairwise anything — the simplified
    (centroid-based) silhouette IS the 100 TB variant of the O(n²)
    classic."""
    emb = _emb(spark, sf_dir)
    comps = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("j", "xf")
    ).select(
        "vec_id",
        "label",
        "j",
        F.floor(F.col("xf").cast("double") * float(GRID) + 0.5)
        .cast("bigint")
        .alias("x"),
    )
    cent = comps.groupBy(F.col("label").alias("clabel"), "j").agg(
        F.expr(
            "CAST((sum(x) - ((sum(x) % count(*)) + count(*)) % count(*))"
            " / count(*) AS BIGINT)"
        ).alias("m")
    )
    dv = (
        comps.join(F.broadcast(cent), "j")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum((F.col("x") - F.col("m")) * (F.col("x") - F.col("m"))).alias(
                "d2"
            )
        )
    )
    ab = dv.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.col("d2"))).alias(
            "a2"
        ),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("d2"))).alias(
            "b2"
        ),
    )
    sil = ab.selectExpr(
        "label",
        "CAST((1000 * (b2 - a2)) div greatest(a2, b2, 1) AS BIGINT)"
        " AS s_milli",
    )
    return (
        sil.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.expr("CAST(sum(s_milli) div count(*) AS BIGINT)").alias(
                "avg_sil_milli"
            ),
            F.sum(F.when(F.col("s_milli") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_negative"),
        )
        .orderBy("label")
    )
