"""Similarity search over the `embeddings` table.

ann_bruteforce — exact cosine top-k (the correctness baseline; one
broadcast of the query set, no shuffle of the corpus).
ann_lsh — random-hyperplane LSH bucketing (the 100 TB path: corpus is
bucketed once, queries probe only their bucket).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from wally_spark.operators.checkpoint import pin
from wally_spark.plans.registry import register
from wally_spark.tables import fan_out, load_tables

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO fan_out here (measured, r6): the ANN/k-means paths aggregate
    # via Arrow-batched numpy over whole partitions and iterate rounds
    # on the driver — splitting a tiny local scan into ~cores
    # micro-partitions multiplies per-batch/per-round overhead for no
    # parallel win (2-4x slower at sf0.1). At scale the scan is
    # already wide.
    return load_tables(spark, sf_dir)["embeddings"]


def _cos(ea, eb):
    dot = F.aggregate(F.zip_with(ea, eb, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v)
    n = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, v: a + v * v))  # noqa: E731
    return dot / (n(ea) * n(eb))


@register(
    "ann_bruteforce",
    oracle=f"""
SELECT query_id, neighbor_id, rank, cos_bp FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         floor(10000.0 * list_cosine_similarity(q.embedding, c.embedding))::BIGINT
           AS cos_bp,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                    c.vec_id) AS rank
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERIES})
WHERE rank <= {TOP_K}
""",
    tags=("similarity", "ann"),
)
def ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus — corpus never shuffles, scales linearly with corpus size."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", _cos(F.col("qe"), F.col("ce")))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.floor(10000.0 * F.col("cos")).cast("bigint").alias("cos_bp"),
        )
    )


MAX_DIM = 128  # sign tables cover embeddings up to this many components
N_BANDS = 8
PLANES_PER_BAND = 4


def _plane_signs(p: int) -> list[float]:
    """±1 sign for plane p, component j: parity of the first hex nibble
    of md5("p:j"). Deterministic, so every executor derives the exact
    same plane matrix from the module source — nothing to broadcast or
    store at 100 TB."""
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[0], 16) % 2 == 0
        else -1.0
        for j in range(MAX_DIM)
    ]


_SIGNS = None


def _signs_matrix():
    """(MAX_DIM, N_BANDS*PLANES_PER_BAND) ±1 matrix, column p =
    _plane_signs(p). Built lazily once per process."""
    global _SIGNS
    if _SIGNS is None:
        import numpy as np

        _SIGNS = np.array(
            [_plane_signs(p) for p in range(N_BANDS * PLANES_PER_BAND)]
        ).T
    return _SIGNS


def _band_sigs(emb_series: "pd.Series") -> "pd.Series":
    """pandas Series of float vectors -> pandas Series of N_BANDS band
    signatures (each a PLANES_PER_BAND-bit int). ONE numpy matmul per
    Arrow batch: bit i of band b = [ dot(v, plane b*PPB+i) > 0 ].

    This is the designated vectorized-Python path: round 1 built the
    signature as 32 nested JVM higher-order aggregates with the plane
    matrix inlined as literal arrays — ~6 s of py4j plan construction
    plus interpreted (non-codegen) per-row evaluation. A single BLAS
    matmul over each Arrow batch is faster at sf0.1 and the right shape
    for a 1000-executor scan: O(batch × dim × 32) FLOPs, no shuffle, no
    driver participation."""
    import numpy as np
    import pandas as pd

    if not len(emb_series):
        return pd.Series([], dtype=object)
    m = np.array(emb_series.tolist(), dtype=np.float64)  # (n, dim)
    bits = (m @ _signs_matrix()[: m.shape[1]]) > 0  # (n, 32)
    w = 1 << np.arange(PLANES_PER_BAND, dtype=np.int64)
    sigs = np.stack(
        [
            (bits[:, b * PLANES_PER_BAND : (b + 1) * PLANES_PER_BAND] @ w)
            for b in range(N_BANDS)
        ],
        axis=1,
    )  # (n, N_BANDS)
    return pd.Series(list(sigs))


_BAND_SIGS_UDF = None


def _band_sigs_udf(col):
    # built lazily: pandas_udf registration needs a live session, which
    # doesn't exist when executors re-import this module
    global _BAND_SIGS_UDF
    if _BAND_SIGS_UDF is None:
        from pyspark.sql.types import ArrayType, LongType

        _BAND_SIGS_UDF = F.pandas_udf(_band_sigs, ArrayType(LongType()))
    return _BAND_SIGS_UDF(col)


def _banded(df: DataFrame, id_alias: str, emb_alias: str) -> DataFrame:
    """Explode a vector table into (id, emb, band_id, band_sig) rows —
    one row per band, each band a PLANES_PER_BAND-bit hyperplane
    signature over its own disjoint plane set."""
    return df.select(
        F.col("vec_id").alias(id_alias),
        F.col("embedding").alias(emb_alias),
        F.posexplode(_band_sigs_udf(F.col("embedding"))).alias(
            "band_id", "band_sig"
        ),
    ).select(id_alias, emb_alias, "band_id", "band_sig")


# DuckDB replication of the md5-derived hyperplane signatures (the
# dedup_simhash technique): planes are a pure function of md5("p:j"),
# so the oracle derives the SAME 8×4-bit band signatures in SQL —
# float64 dot products over the float32-exact embedding values, matching
# _band_sigs' numpy matmul bit-for-bit (parity asserted by the driver
# hash check and tests/test_oracle_parity.py).
_SIGS_CTE = f"""comps AS (
  SELECT vec_id, u.i - 1 AS j, u.x::DOUBLE AS x
  FROM (SELECT vec_id, unnest(list_transform(embedding, (x, i) -> {{'x': x, 'i': i}})) AS u
        FROM embeddings)
),
planes AS (
  SELECT p.p, j.j,
         CASE WHEN strpos('02468ace', substr(md5(p.p::VARCHAR || ':' || j.j::VARCHAR), 1, 1)) > 0
              THEN 1.0 ELSE -1.0 END AS s
  FROM generate_series(0, {N_BANDS * PLANES_PER_BAND - 1}) p(p),
       generate_series(0, 63) j(j)
),
dots AS (
  SELECT c.vec_id, pl.p, sum(c.x * pl.s) AS dot
  FROM comps c JOIN planes pl ON c.j = pl.j
  GROUP BY c.vec_id, pl.p
),
sigs AS (
  SELECT vec_id, p // {PLANES_PER_BAND} AS band_id,
         sum(CASE WHEN dot > 0 THEN 1 << (p % {PLANES_PER_BAND}) ELSE 0 END)::BIGINT AS band_sig
  FROM dots GROUP BY vec_id, p // {PLANES_PER_BAND}
)"""

_SIG_CTE = f"""
WITH {_SIGS_CTE},
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM sigs q JOIN sigs c
    ON q.band_id = c.band_id AND q.band_sig = c.band_sig AND q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
"""

_LSH_ORACLE = f"""{_SIG_CTE}
SELECT query_id, neighbor_id, rank, cos_bp FROM (
  SELECT cand.query_id, cand.neighbor_id,
         floor(10000.0 * list_cosine_similarity(q.embedding, c.embedding))::BIGINT AS cos_bp,
         row_number() OVER (
           PARTITION BY cand.query_id
           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                    cand.neighbor_id) AS rank
  FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
            JOIN embeddings c ON c.vec_id = cand.neighbor_id)
WHERE rank <= {TOP_K}
"""


@register("ann_lsh", oracle=_LSH_ORACLE, tags=("similarity", "ann", "lsh"))
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded hyperplane-LSH ANN with OR-amplification: 8 bands × 4
    planes; a corpus vector is a candidate if it collides with the
    query in ANY band (P[miss] = (1-p^4)^8, so a cos≈0.9 neighbor is
    found with ~99.8% probability vs ~45% for round 1's single 12-bit
    band); exact cosine re-ranks the deduplicated candidates.
    tests/test_similarity_ops.py asserts recall vs ann_bruteforce on
    the high-cosine neighbors.

    Full hash oracle: the md5-derived planes are engine-replicable, so
    DuckDB recomputes identical band signatures (_SIG_CTE).
    At 100 TB: one narrow pass signs the corpus, shuffle is only on the
    (band_id, band_sig) key, band count and width are the recall/cost
    dials."""
    emb = _emb(spark, sf_dir)
    c = _banded(emb, "neighbor_id", "ce")
    q = _banded(emb.where(F.col("vec_id") < N_QUERIES), "query_id", "qe")
    cand = (
        c.alias("c")
        .join(
            F.broadcast(q.alias("q")),
            (F.col("c.band_id") == F.col("q.band_id"))
            & (F.col("c.band_sig") == F.col("q.band_sig"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        cand.withColumn("cos", _cos(F.col("qe"), F.col("ce")))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.floor(10000.0 * F.col("cos")).cast("bigint").alias("cos_bp"),
        )
    )


def _quantized(emb: DataFrame) -> DataFrame:
    """vec_id, qv (int8-range ints), scale — per-vector symmetric
    quantization of the unit-normalized embedding, computed entirely
    with JVM-side higher-order functions: no UDF, no driver pass, so
    quantization runs where the data lives (the round-1 version
    collect()ed the corpus to the driver to quantize it in numpy)."""
    norm = F.sqrt(
        F.aggregate("embedding", F.lit(0.0), lambda a, v: a + v * v)
    )
    unit = F.transform("embedding", lambda x: x / F.col("norm"))
    scale = F.array_max(F.transform("unit", lambda x: F.abs(x))) / F.lit(127.0)
    qv = F.transform("unit", lambda x: F.round(x / F.col("scale")).cast("int"))
    return (
        emb.select("vec_id", "embedding")
        .withColumn("norm", norm)
        .withColumn("unit", unit)
        .withColumn("scale", scale)
        .select("vec_id", qv.alias("qv"), "scale")
    )


_QUANTIZED_ORACLE = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings
), n AS (
  SELECT vec_id, e,
         sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM base
), s AS (
  SELECT vec_id, unit,
         list_max(list_transform(unit, x -> abs(x))) / 127.0 AS scale
  FROM (SELECT vec_id, list_transform(e, x -> x / nrm) AS unit FROM n)
), qz AS (
  SELECT vec_id,
         list_transform(unit, x -> round(x / scale)::BIGINT) AS qv,
         scale
  FROM s
), pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         -- mirror Spark's left-assoc (bigint_dot * q_scale) * c_scale
         (list_sum(list_transform(range(1, len(q.qv) + 1),
             i -> q.qv[i] * c.qv[i]))::BIGINT
          * q.scale) * c.scale AS cos_q
  FROM qz q JOIN qz c
    ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, rank::BIGINT AS rank,
       floor(10000.0 * cos_q)::BIGINT AS cos_q_bp
FROM (
  SELECT query_id, neighbor_id, cos_q,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cos_q DESC, neighbor_id) AS rank
  FROM pairs)
WHERE rank <= {TOP_K}
"""


@register(
    "ann_quantized",
    oracle=_QUANTIZED_ORACLE,
    tags=("similarity", "ann", "quantized"),
)
def ann_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k ANN over int8-quantized embeddings (per-vector symmetric
    scale): 4× less memory/IO than float32, which at 100 TB is the
    difference between a corpus fitting executor memory or not.

    Fully declarative: corpus and query sides quantize executor-side
    (_quantized), the small query set broadcasts, integer dot products
    accumulate exactly in bigint, and a window takes top-k. The corpus
    never shuffles and never touches the driver. FULL oracle since r5:
    every quantization step is deterministic arithmetic both engines
    evaluate identically (sequential float64 folds, half-up rounding,
    exact bigint dot, and the oracle mirrors Spark's multiply
    associativity); recall vs the exact baseline additionally asserted
    in tests/test_similarity_ops.py."""
    emb = _emb(spark, sf_dir)
    qz = _quantized(emb)
    q = qz.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("scale").alias("q_scale"),
    )
    c = qz.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("qv").alias("c_qv"),
        F.col("scale").alias("c_scale"),
    )
    dot = F.aggregate(
        F.zip_with("q_qv", "c_qv", lambda x, y: (x * y).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda a, v: a + v,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_q"), "neighbor_id")
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_q", dot * F.col("q_scale") * F.col("c_scale"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.floor(10000.0 * F.col("cos_q")).cast("bigint").alias("cos_q_bp"),
        )
    )


@register("ann_index_probe", oracle=_LSH_ORACLE, tags=("similarity", "ann", "index"))
def ann_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistent banded-LSH index: build once (bucketed table keyed by
    (band_id, band_sig) — the resident structure a similarity service
    keeps at 100 TB), then probe with the standard query set. Agrees
    exactly with the transient ann_lsh (tests/test_ann_index.py), so it
    shares ann_lsh's full signature-replication oracle."""
    from wally_spark.operators.ann_index import build_ann_index, query_ann_index
    from wally_spark.tables import dataset_tag

    emb = _emb(spark, sf_dir)
    # tag fingerprints the data (size+mtime), not just the path: a
    # regenerated sf_dir rebuilds the index instead of serving stale hits
    table = "ann_idx_" + dataset_tag(spark, sf_dir, ("embeddings",))
    # build ONCE per session + sf_dir ("the index IS the state");
    # build_ann_index itself self-cleans for explicit rebuilds
    if not spark.catalog.tableExists(table):
        build_ann_index(spark, emb, table, n_buckets=16)
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return query_ann_index(spark, table, q, top_k=TOP_K)


N_CELLS = 16
N_PROBE = 3
IVF_ITERS = 3


def _ivf_oracle() -> str:
    """DuckDB replication of ann_ivf, Lloyd's rounds unrolled as CTE
    chains: init = the N_CELLS lowest vec_ids (exactly
    operators/kmeans.py's deterministic init), each round = argmin
    assignment (ties to the lowest cluster, same as numpy argmin) then
    per-(cluster, position) mean with empty-cell carry-forward, then a
    final assignment, the per-cell centroid, the N_PROBE nearest cells
    per query, and the exact cosine re-rank. All distance math in
    float64 over the float32-exact parquet values, mirroring the
    Arrow-batch numpy path."""
    cte = f"""
WITH comps AS (
  SELECT vec_id, u.i - 1 AS j, u.x::DOUBLE AS x
  FROM (SELECT vec_id, unnest(list_transform(embedding, (x, i) -> {{'x': x, 'i': i}})) AS u
        FROM embeddings)
),
init_ids AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cluster
  FROM embeddings ORDER BY vec_id LIMIT {N_CELLS}
),
c0 AS (
  SELECT i.cluster, c.j AS p, c.x AS m
  FROM init_ids i JOIN comps c USING (vec_id)
)"""
    prev = "c0"
    for r in range(1, IVF_ITERS + 1):
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
  SELECT a.cluster, c.j AS p, avg(c.x) AS m
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
),
cells AS (
  SELECT vec_id, cluster AS cell FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rk
    FROM dfin) WHERE rk = 1
),
cent AS (
  SELECT a.cell, c.j AS p, avg(c.x) AS m
  FROM cells a JOIN comps c USING (vec_id)
  GROUP BY a.cell, c.j
),
qd AS (
  SELECT q.vec_id AS query_id, ct.cell, sum((q.x - ct.m) * (q.x - ct.m)) AS cd
  FROM comps q JOIN cent ct ON q.j = ct.p
  WHERE q.vec_id < {N_QUERIES}
  GROUP BY q.vec_id, ct.cell
),
probe AS (
  SELECT query_id, cell FROM (
    SELECT query_id, cell,
           row_number() OVER (PARTITION BY query_id ORDER BY cd, cell) AS rk
    FROM qd) WHERE rk <= {N_PROBE}
)
SELECT query_id, neighbor_id, rank, cos_bp FROM (
  SELECT pr.query_id, a.vec_id AS neighbor_id,
         floor(10000.0 * list_cosine_similarity(q.embedding, c.embedding))::BIGINT AS cos_bp,
         row_number() OVER (
           PARTITION BY pr.query_id
           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                    a.vec_id) AS rank
  FROM probe pr
  JOIN cells a ON a.cell = pr.cell AND a.vec_id <> pr.query_id
  JOIN embeddings q ON q.vec_id = pr.query_id
  JOIN embeddings c ON c.vec_id = a.vec_id)
WHERE rank <= {TOP_K}
"""
    return cte


@register("ann_ivf", oracle=_ivf_oracle(), tags=("similarity", "ann", "ivf", "iterative"))
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: a k-means coarse quantizer
    (operators/kmeans.py, deterministic) partitions the corpus into
    N_CELLS cells; each query scans only its N_PROBE nearest cells and
    re-ranks exactly by cosine. The other classic ANN family next to
    hyperplane LSH (ann_lsh): LSH bounds collision probability with no
    training, IVF adapts cells to the data distribution — at 100 TB
    the corpus is written bucketed by cell_id (like
    operators/ann_index.py does for band signatures) and a query
    touches N_PROBE/N_CELLS of it. Full hash oracle: the deterministic
    Lloyd's rounds are unrolled as SQL CTEs (_ivf_oracle); recall vs
    ann_bruteforce is additionally gated in
    tests/test_similarity_ops.py."""
    from wally_spark.operators.kmeans import lloyd_kmeans

    emb = _emb(spark, sf_dir)
    # coarse quantizer: one deterministic k-means over the corpus; the
    # assignment is checkpointed executor-side because both the corpus
    # side and the centroid derivation read it
    cells = pin(
        lloyd_kmeans(emb, k=N_CELLS, iters=IVF_ITERS).select(
            "vec_id", F.col("cluster").alias("cell")
        )
    )
    corpus = emb.join(cells, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        "cell",
    )
    # cell centroid = mean of members (declarative posexplode agg —
    # N_CELLS × dim rows, broadcastable)
    cent_arrays = (
        emb.join(cells, "vec_id")
        .select("cell", F.posexplode("embedding").alias("p", "v"))
        .groupBy("cell", "p")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("p", "m"))).alias("pm"))
        .select("cell", F.transform("pm", lambda s: s["m"]).alias("centroid"))
    )
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    # rank cells per query by centroid distance, keep N_PROBE
    dist = F.aggregate(
        F.zip_with("qe", "centroid", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    wq = Window.partitionBy("query_id").orderBy("cell_dist", "cell")
    probe = (
        q.crossJoin(F.broadcast(cent_arrays))
        .withColumn("cell_dist", dist)
        .withColumn("rk", F.row_number().over(wq))
        .where(F.col("rk") <= N_PROBE)
        .select("query_id", "qe", "cell")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        corpus.join(
            F.broadcast(probe),
            (corpus["cell"] == probe["cell"])
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .withColumn("cos", _cos(F.col("qe"), F.col("ce")))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.floor(10000.0 * F.col("cos")).cast("bigint").alias("cos_bp"),
        )
    )


from wally_spark.operators.pq import (  # noqa: E402
    PQ_CAND,
    PQ_ITERS,
    PQ_K,
    PQ_SUB,
    PQ_SUBDIM,
    _PQ_SAMPLE_NIBBLES,
    pq_adc_udf,
    pq_codebooks,
    pq_encode_udf,
)


def _pq_oracle() -> str:
    """DuckDB replication of ann_pq: per-subspace Lloyd's rounds over
    the same md5-sampled training set, full-corpus encoding, ADC
    candidate ranking, exact cosine re-rank (the _ivf_oracle technique
    applied per subspace)."""
    nib = ", ".join(f"'{n}'" for n in _PQ_SAMPLE_NIBBLES)
    parts = [
        """
WITH comps AS (
  SELECT vec_id, u.i - 1 AS j, u.x::DOUBLE AS x
  FROM (SELECT vec_id, unnest(list_transform(embedding, (x, i) -> {'x': x, 'i': i})) AS u
        FROM embeddings)
)"""
    ]
    for s in range(PQ_SUB):
        lo, hi = s * PQ_SUBDIM, s * PQ_SUBDIM + PQ_SUBDIM - 1
        parts.append(f""",
comps{s} AS (
  SELECT vec_id, j - {lo} AS p, x FROM comps WHERE j BETWEEN {lo} AND {hi}
),
samp{s} AS (
  SELECT * FROM comps{s}
  WHERE substring(md5(vec_id::VARCHAR), 1, 1) IN ({nib})
),
init{s} AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cluster
  FROM (SELECT DISTINCT vec_id FROM samp{s}) ORDER BY vec_id LIMIT {PQ_K}
),
c0_{s} AS (
  SELECT i.cluster, c.p, c.x AS m FROM init{s} i JOIN samp{s} c USING (vec_id)
)""")
        prev = f"c0_{s}"
        for r in range(1, PQ_ITERS + 1):
            parts.append(f""",
d{r}_{s} AS (
  SELECT c.vec_id, k.cluster, sum((c.x - k.m) * (c.x - k.m)) AS d2
  FROM samp{s} c JOIN {prev} k ON c.p = k.p
  GROUP BY c.vec_id, k.cluster
),
a{r}_{s} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rk
    FROM d{r}_{s}) WHERE rk = 1
),
m{r}_{s} AS (
  SELECT a.cluster, c.p, avg(c.x) AS m
  FROM a{r}_{s} a JOIN samp{s} c USING (vec_id)
  GROUP BY a.cluster, c.p
),
c{r}_{s} AS (
  SELECT k.cluster, k.p, coalesce(u.m, k.m) AS m
  FROM {prev} k LEFT JOIN m{r}_{s} u ON u.cluster = k.cluster AND u.p = k.p
)""")
            prev = f"c{r}_{s}"
        parts.append(f""",
dc_{s} AS (
  SELECT c.vec_id, k.cluster, sum((c.x - k.m) * (c.x - k.m)) AS d2
  FROM comps{s} c JOIN {prev} k ON c.p = k.p
  GROUP BY c.vec_id, k.cluster
),
code{s} AS (
  SELECT vec_id, cluster AS code FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rk
    FROM dc_{s}) WHERE rk = 1
),
qd{s} AS (
  SELECT q.vec_id AS query_id, k.cluster, sum((q.x - k.m) * (q.x - k.m)) AS d2
  FROM comps{s} q JOIN {prev} k ON q.p = k.p
  WHERE q.vec_id < {N_QUERIES}
  GROUP BY q.vec_id, k.cluster
),
ad{s} AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, q.d2
  FROM code{s} c JOIN qd{s} q ON q.cluster = c.code
)""")
    union = " UNION ALL ".join(f"SELECT * FROM ad{s}" for s in range(PQ_SUB))
    parts.append(f""",
approx AS (
  SELECT query_id, neighbor_id, sum(d2) AS ad2
  FROM ({union})
  WHERE query_id <> neighbor_id
  GROUP BY query_id, neighbor_id
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY ad2, neighbor_id) AS rk
    FROM approx) WHERE rk <= {PQ_CAND}
)
SELECT query_id, neighbor_id, rank, cos_bp FROM (
  SELECT cand.query_id, cand.neighbor_id,
         floor(10000.0 * list_cosine_similarity(q.embedding, c.embedding))::BIGINT AS cos_bp,
         row_number() OVER (
           PARTITION BY cand.query_id
           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                    cand.neighbor_id) AS rank
  FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
            JOIN embeddings c ON c.vec_id = cand.neighbor_id)
WHERE rank <= {TOP_K}
""")
    return "".join(parts)


@register("ann_pq", oracle=_pq_oracle(), tags=("similarity", "ann", "pq", "iterative"))
def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (the remaining classic family next to
    LSH and IVF): per-subspace codebooks quantize the corpus to
    PQ_SUB × log2(PQ_K) bits per vector (8 bytes vs 256 — at 100 TB the
    difference between codes fitting executor memory and not), queries
    rank candidates by asymmetric distance through the codebook, and
    exact cosine re-ranks the top PQ_CAND. Codebooks train on a
    deterministic md5-¼ sample; encoding is one Arrow argmin pass over
    the corpus; the ADC scan broadcasts the tiny query set so the
    corpus (codes, not vectors) never shuffles. Full hash oracle: the
    per-subspace Lloyd's rounds, encoding, and ADC ranking are unrolled
    in SQL (_pq_oracle)."""
    emb = _emb(spark, sf_dir)
    cbs = pq_codebooks(emb)
    codes = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        pq_encode_udf(cbs)(F.col("embedding")).alias("codes"),
    )
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    approx = (
        codes.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("ad2", pq_adc_udf(cbs)(F.col("qe"), F.col("codes")))
    )
    wq = Window.partitionBy("query_id").orderBy("ad2", "neighbor_id")
    cand = (
        approx.withColumn("rk", F.row_number().over(wq))
        .where(F.col("rk") <= PQ_CAND)
        .select("query_id", "neighbor_id", "qe")
    )
    ce = _emb(spark, sf_dir).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        cand.join(ce, "neighbor_id")
        .withColumn("cos", _cos(F.col("qe"), F.col("ce")))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.floor(10000.0 * F.col("cos")).cast("bigint").alias("cos_bp"),
        )
    )


# --- kNN label vote: majority-label classification (r7) ---------------------
@register(
    "knn_label_vote",
    oracle=f"""
WITH ranked AS (
  SELECT q.vec_id AS query_id, q.label AS true_label, c.label AS nl,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                    c.vec_id) AS rank
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
votes AS (
  SELECT query_id, true_label, nl AS label, count(*)::BIGINT AS n_votes
  FROM ranked WHERE rank <= {TOP_K} GROUP BY 1, 2, 3
),
best AS (
  SELECT query_id, true_label, label, n_votes,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY n_votes DESC, label) AS rk
  FROM votes
)
SELECT query_id, true_label::BIGINT AS true_label,
       label::BIGINT AS pred_label, n_votes,
       (label = true_label) AS correct
FROM best WHERE rk = 1
""",
    tags=("similarity", "knn", "classify"),
)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification by majority label vote over the exact top-K
    cosine neighbors — the label-propagation / weak-annotation step a
    curation pipeline runs when a small labeled seed set must label a
    large corpus (here the query set doubles as the eval probe:
    ``correct`` compares the vote against the query's own label).
    Vote ties break deterministically on the smaller label id.

    Scale shape: identical candidate generation to ann_bruteforce
    (broadcast query set, corpus never shuffles, per-query top-K via a
    bounded rank window); the vote adds one (query, label) aggregate
    over K·|Q| rows — driver never sees a vector. Swap the candidate
    stage for ann_ivf/ann_pq probes when the corpus outgrows the
    exact scan."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("qe"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("nl"),
        F.col("embedding").alias("ce"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    ranked = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", _cos(F.col("qe"), F.col("ce")))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
    )
    votes = ranked.groupBy(
        "query_id", "true_label", F.col("nl").alias("label")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_votes"))
    w_best = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), "label"
    )
    return (
        votes.withColumn("rk", F.row_number().over(w_best))
        .where(F.col("rk") == 1)
        .select(
            "query_id",
            F.col("true_label").cast("bigint").alias("true_label"),
            F.col("label").cast("bigint").alias("pred_label"),
            "n_votes",
            (F.col("label") == F.col("true_label")).alias("correct"),
        )
    )


# --- LSH recall audit (r8) ---------------------------------------------------
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k audit of the LSH index against exact brute force — the
    gate that decides whether the banded-LSH config (N_BANDS ×
    PLANES_PER_BAND) is safe to deploy: per query, how many of the
    true cosine top-K the LSH candidates recovered, in basis points.
    The audit a similarity service runs on a held-out query sample
    after every index build or band-config change (the same
    sketch-calibration role minhash_estimate_audit plays for MinHash).

    Scale shape: composes the two registered pipelines unchanged
    (brute force: broadcast query set, corpus never shuffles; LSH:
    banded signature join) and finishes with a flag join + aggregate
    on the query-bounded result sets — the audit adds no scan of its
    own beyond the two pipelines it grades. Oracle: the two lanes'
    oracles composed as CTE subqueries, so the audit can never drift
    from what the graded lanes actually compute."""
    bf = ann_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    got = ann_lsh(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        bf.join(got, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_true"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hit"),
            F.expr("10000 * sum(coalesce(hit, 0)) div count(1)")
            .cast("bigint")
            .alias("recall_bp"),
        )
    )


from wally_spark.plans.registry import REGISTRY as _REG  # noqa: E402

register(
    "ann_recall_report",
    oracle=f"""
WITH bf AS (SELECT query_id, neighbor_id FROM ({_REG['ann_bruteforce'].oracle}) t),
lshr AS (SELECT query_id, neighbor_id FROM ({_REG['ann_lsh'].oracle}) t)
SELECT bf.query_id,
       count(*)::BIGINT AS n_true,
       sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_hit,
       (10000 * sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         // count(*))::BIGINT AS recall_bp
FROM bf LEFT JOIN lshr l
  ON l.query_id = bf.query_id AND l.neighbor_id = bf.neighbor_id
GROUP BY bf.query_id
""",
    tags=("similarity", "ann", "report"),
)(ann_recall_report)


# --- corpus-wide kNN graph via banded LSH (r9) -------------------------------
KNN_GRAPH_K = 3
EMB_DIM = 64  # the corpus embedding width (_SIGS_CTE assumes it too)


def _knn_graph_oracle() -> str:
    from wally_spark.plans.dedup import PAIR_EMIT_BUCKET

    return f"""
WITH {_SIGS_CTE},
bk AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY band_id, band_sig) AS bsz
    FROM sigs)
  WHERE bsz <= {PAIR_EMIT_BUCKET}),
cand AS (
  SELECT DISTINCT a.vec_id AS src, c.vec_id AS dst
  FROM bk a JOIN bk c
    ON a.band_id = c.band_id AND a.band_sig = c.band_sig
   AND a.vec_id <> c.vec_id)
SELECT src, rank, dst, cos_bp FROM (
  SELECT cand.src, cand.dst,
         floor(10000.0 * list_cosine_similarity(
                 s.embedding::DOUBLE[], d.embedding::DOUBLE[]) + 1e-9)
           ::BIGINT AS cos_bp,
         row_number() OVER (
           PARTITION BY cand.src
           ORDER BY floor(10000.0 * list_cosine_similarity(
                      s.embedding::DOUBLE[], d.embedding::DOUBLE[]) + 1e-9)
                    DESC, cand.dst)
           AS rank
  FROM cand JOIN embeddings s ON s.vec_id = cand.src
            JOIN embeddings d ON d.vec_id = cand.dst)
WHERE rank <= {KNN_GRAPH_K}
ORDER BY src, rank
"""


@register(
    "embedding_knn_graph",
    oracle=_knn_graph_oracle(),
    tags=("similarity", "ann", "graph"),
)
def embedding_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide approximate kNN GRAPH — the structure semantic
    clustering / label propagation / graph-based dedup consume (every
    vector gets its top-K banded-LSH neighbors, not just a 10-query
    probe set like ann_lsh): candidates are same-band signature
    collisions in EITHER direction, exact cosine ranks each vector's
    candidate list, keep K.

    Scale shape (dedup_embedding_lsh's discipline, plans/dedup.py:745):
    the self-join and dedup run over NARROW (vid, band, sig) rows —
    vectors join in only AFTER the pair set is deduplicated, so the
    wide arrays never ride the band shuffle (its measured 2x); buckets
    past PAIR_EMIT_BUCKET are dropped from emission BEFORE the join
    (mass-duplicate cells — exact dedup's job); cosine is one Arrow
    einsum per batch (_pair_cos_udf — expression-tree spellings,
    interpreted OR unrolled-codegen, measured 3-6x slower at this
    lane's 1.6M-candidate mass); ranking is at integer basis-point
    resolution with dst tie-break so engine float noise cannot flip a
    rank; the per-vector top-K window is candidate-bounded, never
    corpus-sized."""
    both = _knn_scored(spark, sf_dir)
    w = Window.partitionBy("src").orderBy(F.desc("cos_bp"), "dst")
    return (
        both.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= KNN_GRAPH_K)
        .select(
            "src",
            F.col("rank").cast("bigint").alias("rank"),
            "dst",
            "cos_bp",
        )
        .orderBy("src", "rank")
    )


def _knn_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed (src, dst, cos_bp) scored banded-LSH candidate pairs —
    the shared core of embedding_knn_graph and contrastive_pairs (the
    r10 hard-negative miner). See embedding_knn_graph's docstring for
    the scale discipline (narrow-row self-join, PAIR_EMIT_BUCKET
    pre-join cap, arrays attach after pair dedup, one Arrow einsum,
    bp-resolution scores)."""
    from wally_spark.plans.dedup import PAIR_EMIT_BUCKET

    emb = _emb(spark, sf_dir)
    b = pin(_banded(emb, "vid", "e").drop("e"))
    sizes = b.groupBy("band_id", "band_sig").agg(
        F.count(F.lit(1)).alias("bsz")
    )
    bk = b.join(
        sizes.where(F.col("bsz") <= PAIR_EMIT_BUCKET), ["band_id", "band_sig"]
    ).select("vid", "band_id", "band_sig")
    a, c = bk.alias("a"), bk.alias("c")
    # enumerate each UNDIRECTED pair once (src < dst): cosine is
    # symmetric, so the scored pairs mirror afterwards — half the
    # einsum and join mass of a directed enumeration
    cand = (
        a.join(
            c,
            (F.col("a.band_id") == F.col("c.band_id"))
            & (F.col("a.band_sig") == F.col("c.band_sig"))
            & (F.col("a.vid") < F.col("c.vid")),
        )
        .select(F.col("a.vid").alias("src"), F.col("c.vid").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
    from wally_spark.plans.dedup import pair_cos_scored

    se = emb.select(F.col("vec_id").alias("src"), F.col("embedding").alias("se"))
    de = emb.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("de"))
    # rank at BASIS-POINT resolution with dst tie-break, and floor with
    # a +1e-9 nudge on BOTH sides: the ranking is then a pure function
    # of the integer cos_bp values. The oracle casts to DOUBLE[] —
    # DuckDB's cosine over FLOAT[] stays in float32 (measured 3.5e-8
    # off, enough to cross a bp boundary); in float64 both engines
    # agree to ~1e-15 and the nudge absorbs exact-boundary cases.
    # (cosine itself: one zero-copy Arrow einsum — pair_cos_scored.)
    scored = (
        pair_cos_scored(
            cand.join(se, "src").join(de, "dst"), "src", "dst", "se", "de"
        )
        .withColumn(
            "cos_bp",
            F.floor(10000.0 * F.col("cos") + 1e-9).cast("bigint"),
        )
        .select("src", "dst", "cos_bp")
    )
    # r13 (guide §1.2 step 1 — don't compute things twice): the old
    # mirror spelling `scored.unionByName(scored.select(dst, src, ...))`
    # planned the ENTIRE candidate subtree twice — at any scale where
    # the per-side joins broadcast there is no Exchange for reuse to
    # share, so both Union branches re-ran the band self-join AND the
    # Arrow einsum (plan evidence: two ArrowEvalPython nodes,
    # plans/r13/embedding_knn_graph_prof1.txt ops 45/91). Emit both
    # directions from ONE scored pass instead: a 2-element inline
    # explode per undirected pair — identical multiset, one einsum.
    pair = F.explode(
        F.array(
            F.struct(
                F.col("src").alias("src"),
                F.col("dst").alias("dst"),
                F.col("cos_bp").alias("cos_bp"),
            ),
            F.struct(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                F.col("cos_bp").alias("cos_bp"),
            ),
        )
    )
    return scored.select(pair.alias("p")).select("p.src", "p.dst", "p.cos_bp")


# --- contrastive-pair mining (r10) --------------------------------------------
CP_MARGIN_BP = 500  # negatives must sit this far below the positive
CP_HARD_K = 2  # hardest negatives kept per anchor


def _contrastive_oracle() -> str:
    from wally_spark.plans.dedup import PAIR_EMIT_BUCKET

    return f"""
WITH {_SIGS_CTE},
bk AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY band_id, band_sig) AS bsz
    FROM sigs)
  WHERE bsz <= {PAIR_EMIT_BUCKET}),
cand AS (
  SELECT DISTINCT a.vec_id AS src, c.vec_id AS dst
  FROM bk a JOIN bk c
    ON a.band_id = c.band_id AND a.band_sig = c.band_sig
   AND a.vec_id <> c.vec_id),
scored AS (
  SELECT cand.src, cand.dst,
         floor(10000.0 * list_cosine_similarity(
                 s.embedding::DOUBLE[], d.embedding::DOUBLE[]) + 1e-9)
           ::BIGINT AS cos_bp
  FROM cand JOIN embeddings s ON s.vec_id = cand.src
            JOIN embeddings d ON d.vec_id = cand.dst),
pos AS (
  SELECT src, dst AS pos_dst, cos_bp AS pos_cos_bp FROM (
    SELECT *, row_number() OVER (
      PARTITION BY src ORDER BY cos_bp DESC, dst) AS rk
    FROM scored) WHERE rk = 1),
negs AS (
  SELECT s.src, p.pos_dst, p.pos_cos_bp, s.dst, s.cos_bp,
         row_number() OVER (
           PARTITION BY s.src ORDER BY s.cos_bp DESC, s.dst) AS neg_rank
  FROM scored s JOIN pos p USING (src)
  WHERE s.cos_bp <= p.pos_cos_bp - {CP_MARGIN_BP})
SELECT src AS anchor, pos_dst, pos_cos_bp,
       neg_rank::BIGINT AS neg_rank, dst AS neg_dst, cos_bp AS neg_cos_bp
FROM negs WHERE neg_rank <= {CP_HARD_K}
ORDER BY anchor, neg_rank
"""


@register(
    "contrastive_pairs",
    oracle=_contrastive_oracle(),
    tags=("similarity", "ann", "training"),
)
def contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair mining for embedding training (the SimCSE /
    sentence-transformers hard-negative recipe): per anchor, the
    POSITIVE is its nearest banded-LSH neighbor (rank-1 by exact
    cosine, dst tie-break) and the HARD NEGATIVES are the closest
    candidates at least CP_MARGIN_BP below the positive — near enough
    to be informative, separated enough to not be false negatives
    (the margin guard is what separates this from naive top-K).
    Emits up to CP_HARD_K (anchor, positive, negative) triplet rows —
    the literal training-batch input.

    Scale shape: composes _knn_scored (embedding_knn_graph's shared
    core — banded-LSH candidates, PAIR_EMIT_BUCKET pre-join cap, one
    Arrow einsum, bp-resolution scores); on top of it ONE exchange+sort
    (src, cos_bp desc, dst) serves everything: the positive is
    first_value over that order, the margin filter preserves
    distribution AND order, so the negative row_number needs no second
    exchange or sort — no join back, no pin (r13; the old spelling
    pinned the scored relation, ranked the positive, joined it back
    and re-sorted: measured 6.68 → 4.11 s same-session, rows
    exact-equal)."""
    both = _knn_scored(spark, sf_dir)
    w = Window.partitionBy("src").orderBy(F.desc("cos_bp"), "dst")
    # first over this window = the rank-1 row of the partition (the
    # (cos_bp desc, dst) order is total per src: dst is unique after
    # the candidate dropDuplicates), annotated onto every row — the
    # join-free spelling of "positive per anchor".
    negs = both.select(
        "src",
        "dst",
        "cos_bp",
        F.first("dst").over(w).alias("pos_dst"),
        F.first("cos_bp").over(w).alias("pos_cos_bp"),
    ).where(F.col("cos_bp") <= F.col("pos_cos_bp") - CP_MARGIN_BP)
    return (
        negs.withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= CP_HARD_K)
        .select(
            F.col("src").alias("anchor"),
            "pos_dst",
            "pos_cos_bp",
            F.col("neg_rank").cast("bigint").alias("neg_rank"),
            F.col("dst").alias("neg_dst"),
            F.col("cos_bp").alias("neg_cos_bp"),
        )
        .orderBy("anchor", "neg_rank")
    )
