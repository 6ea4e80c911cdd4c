"""Bucketed-table helpers: pre-shuffle fact tables once at write time
so repeated joins/aggregations on the bucket key run with NO exchange.

At 100 TB this converts every orderkey join from a full shuffle of
both sides into a zipped per-bucket merge — the single biggest win for
a star schema queried repeatedly on the same key."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def drop_table_and_dir(spark: SparkSession, table: str) -> None:
    """The in-memory catalog forgets tables across sessions but their
    warehouse directories persist; clear both so rebuilds don't fail
    with LOCATION_ALREADY_EXISTS."""
    import os
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(warehouse, table.lower()), ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    spark = df.sparkSession
    drop_table_and_dir(spark, table)

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
