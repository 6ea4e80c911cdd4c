"""Similarity search over the `embeddings` table.

ann_bruteforce — exact cosine top-k (the correctness baseline; one
broadcast of the query set, no shuffle of the corpus).
ann_lsh — random-hyperplane LSH bucketing (the 100 TB path: corpus is
bucketed once, queries probe only their bucket).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from wally_spark.plans.registry import register
from wally_spark.tables import load_tables

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors
N_PLANES = 12


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
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


def lsh_signature(col):
    """Random-hyperplane signature: plane p's component j is ±1 from
    the parity of md5(p:j) — deterministic, no stored plane matrix, so
    executors rebuild it for free (no broadcast needed at 100 TB).

    Bit p of the signature = [ sum_j(±1 * v_j) > 0 ].
    Built entirely from higher-order functions: stays JVM-side.
    """
    def plane_dot(p):
        # md5 hex chars are uniform; parity of first hex nibble of
        # md5("p:j") picks the sign for component j.
        return F.aggregate(
            F.transform(
                col,
                lambda v, j: F.when(
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(f"{p}:"), j.cast("string")
                                ).cast("binary")
                            ),
                            1,
                            1,
                        ),
                        16,
                        10,
                    ).cast("int")
                    % 2
                    == 0,
                    v,
                ).otherwise(-v),
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        )

    sig = F.lit(0).cast("long")
    for p in range(N_PLANES):
        sig = sig + F.when(plane_dot(p) > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


@register("ann_lsh", oracle=None, tags=("similarity", "ann", "lsh"))
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: corpus and queries get 12-bit hyperplane
    signatures; candidates are corpus vectors sharing the query's
    bucket; exact cosine re-ranks within the bucket.

    Rows-only oracle (signature bit-fold not SQL-expressible cheaply).
    At 100 TB: one pass to bucket the corpus (narrow), shuffle only on
    the 4096-value bucket key, queries probe single buckets.
    """
    emb = _emb(spark, sf_dir)
    sig = lsh_signature(F.col("embedding"))
    bucketed = emb.select("vec_id", "embedding", sig.alias("bucket"))
    q = bucketed.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
    c = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        "bucket",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        c.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket"))
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


@register("ann_quantized", oracle=None, tags=("similarity", "ann", "quantized"))
def ann_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k ANN over int8-quantized embeddings (per-vector symmetric
    scale): 4× less memory/IO than float32, which at 100 TB is the
    difference between a corpus fitting executor memory or not.

    Fully declarative: corpus and query sides quantize executor-side
    (_quantized), the small query set broadcasts, integer dot products
    accumulate exactly in bigint, and a window takes top-k. The corpus
    never shuffles and never touches the driver. Rows-only oracle
    (quantization rounding is engine-specific); recall vs the exact
    baseline is asserted in tests/test_similarity_ops.py."""
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
