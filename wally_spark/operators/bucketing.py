"""Bucketed-table helpers: pre-shuffle fact tables once at write time
so repeated joins/aggregations on the bucket key run with NO exchange.

At 100 TB this converts every orderkey join from a full shuffle of
both sides into a zipped per-bucket merge — the single biggest win for
a star schema queried repeatedly on the same key."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket
    count: Catalyst plans a SortMergeJoin with no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on)
