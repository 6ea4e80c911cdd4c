"""Registry of named queries with DuckDB oracle SQL.

Every operator claimed in SURVEY.md §2 has an entry here; the driver
(and ``tests/test_oracle_parity.py``) runs the Spark plan and the
oracle SQL side by side and compares row count, schema, and an
order-insensitive value hash. Column names are aliased identically on
both sides; float aggregates are rounded on both sides so the hash is
robust to summation-order differences.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name, fn, oracle, tuple(tags))
        return fn

    return deco
