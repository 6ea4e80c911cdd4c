"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are backed by the registry in
``wally_spark.plans`` — one entry per operator claimed in SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H q1 shape) on /root/testdata/sf0.001."""
    from wally_spark.plans import REGISTRY

    return REGISTRY["q1_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from wally_spark.plans import REGISTRY

    return {name: qd.spark_fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from wally_spark.plans import REGISTRY

    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}
