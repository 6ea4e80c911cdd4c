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
