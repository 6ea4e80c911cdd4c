"""Distributed two-phase prefix sum — the scale-safe replacement for a
global `Window.orderBy(...)` cumulative sum, which Spark executes as a
SINGLE task (the classic global-window trap).

Phase 1: per-bucket value totals (buckets must be ordered consistently
with the global sort order — e.g. a prefix of the ordering hash).
Phase 2: the bucket totals — n_buckets longs, bounded driver state —
prefix-sum on the driver and broadcast back; a per-bucket window
finishes the cumsum fully in parallel.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def bucket_offsets(
    spark: SparkSession,
    df: DataFrame,
    bucket_col: str,
    value_col: str,
    n_buckets: int,
) -> DataFrame:
    """(bucket, bucket_off, total): exclusive prefix sum of per-bucket
    totals in bucket order, plus the grand total on every row (so
    callers needing it avoid a single-partition global window).
    Driver state is n_buckets longs."""
    tot = {
        r["b"]: r["t"]
        for r in df.groupBy(F.col(bucket_col).alias("b"))
        .agg(F.sum(value_col).alias("t"))
        .collect()
    }
    run = 0
    offs = []
    for b in range(n_buckets):
        offs.append((b, run))
        run += tot.get(b, 0)
    return spark.createDataFrame(
        [(b, off, run) for b, off in offs],
        f"{bucket_col} int, bucket_off long, total long",
    )


# Deterministic-sample size target for global_ntile's bucket cuts: the
# cut VALUES only shape bucket balance, never the result, so a ~100k
# sample is plenty — but the sample predicate must be a pure function
# of the data (no RNG) so every job in the plan sees identical buckets.
NTILE_SAMPLE_TARGET = 100_000


def global_ntile(
    spark: SparkSession,
    df: DataFrame,
    sort_key,
    tiebreaks: list,
    k: int,
    out_col: str,
    id_col: str,
    n_buckets: int = 64,
    total_rows: int | None = None,
) -> DataFrame:
    """EXACT ``ntile(k)`` over the global order (sort_key ASC,
    *tiebreaks ASC) without a single-partition window — the scale-safe
    form of the classic RFM/quartile scoring window.

    A bare ``F.ntile(k).over(Window.orderBy(...))`` plans ONE task
    holding every row (the global-window trap; see module docstring).
    This runs the two-phase design instead:

    1. cut values: a DETERMINISTIC hash-sample of ``id_col`` (md5
       prefix < fraction, fraction sized from an exact count — no RNG,
       so the two jobs below agree byte-for-byte on bucket membership)
       yields ~NTILE_SAMPLE_TARGET rows; exact percentiles of
       ``sort_key`` over the sample become ``n_buckets - 1`` cuts
       (driver/broadcast state: n_buckets doubles).
    2. bucket = #cuts strictly below the row's sort_key — an
       order-consistent, value-pure function (equal keys can never
       straddle a bucket), so per-bucket ``row_number`` plus the
       driver-prefix-summed bucket row-counts (``bucket_offsets``) is
       the exact global rank, fully partition-parallel.
    3. the rank maps to its tile with ntile's uneven-bucket rule
       (first ``n % k`` tiles get one extra row).

    Cut skew from heavy sort-key ties degrades balance, never
    exactness: ties share a bucket by construction, and the per-bucket
    window is the only stage that sees them. ``sort_key`` must be a
    non-null numeric column expression (negate it for DESC)."""
    n_frac = len(tiebreaks)  # noqa: F841  (doc aid)
    sk = sort_key.cast("double")
    hash_frac = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("double") / F.lit(float(1 << 32))
    if total_rows is None:
        # one scalar action to size the sample fraction; callers
        # scoring the same relation repeatedly should pass it in
        total_rows = df.count()
    frac = min(1.0, NTILE_SAMPLE_TARGET / max(1, total_rows))
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    cuts_row = (
        df.where(hash_frac < F.lit(frac))
        .agg(
            F.percentile(sk, F.array(*[F.lit(x) for x in fracs])).alias(
                "_cuts"
            )
        )
        .select(F.coalesce(F.col("_cuts"), F.array()).alias("_cuts"))
    )
    bucketed = df.crossJoin(F.broadcast(cuts_row)).withColumn(
        "_gb",
        F.aggregate(
            F.col("_cuts"),
            F.lit(0),
            lambda acc, c: acc + F.when(sk > c, 1).otherwise(0),
        ).cast("int"),
    ).drop("_cuts").withColumn("_one", F.lit(1))
    offs = bucket_offsets(spark, bucketed, "_gb", "_one", n_buckets)
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("_gb").orderBy(sk.asc(), *tiebreaks)
    )
    ranked = bucketed.withColumn("_rn", rn).join(F.broadcast(offs), "_gb")
    r = F.col("bucket_off") + F.col("_rn")
    n = F.col("total")
    q = F.floor(n / k).cast("long")
    rem = (n - k * q).cast("long")
    cutr = rem * (q + 1)
    tile = F.when(r <= cutr, F.floor((r - 1) / (q + 1)) + 1).otherwise(
        rem + F.floor((r - cutr - 1) / q) + 1
    )
    return ranked.withColumn(out_col, tile.cast("long")).drop(
        "_gb", "_one", "_rn", "bucket_off", "total"
    )
