"""Skew-mitigation helpers (SURVEY §6).

AQE's skew-join handling covers sort-merge joins at runtime; salting
is for the cases AQE can't split — skewed aggregation keys and
broadcast-ineligible skewed joins."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _row_salt(df: DataFrame, n_salts: int):
    """Deterministic-under-retry salt expression.

    monotonically_increasing_id() is nondeterministic across task
    retries — after a fetch failure, recomputed rows could land in
    different salt partitions and be dropped or double-counted. Instead
    hash (hashable row columns, spark_partition_id): row content spreads
    distinct rows of a hot key; the partition id spreads byte-identical
    duplicate rows too (the case where content alone would collapse a
    hot key back onto one salt), and is stable within a task recompute
    because a stage retry re-executes the same partition layout.
    Map-typed columns are excluded — xxhash64 cannot hash maps."""
    from pyspark.sql.types import MapType

    hashable = [
        F.col(fld.name)
        for fld in df.schema.fields
        if not isinstance(fld.dataType, MapType)
    ]
    return F.pmod(F.xxhash64(*hashable, F.spark_partition_id()), F.lit(n_salts))


def salted_agg(
    df: DataFrame, key: str, aggs: dict, n_salts: int = 16
) -> DataFrame:
    """Two-phase aggregation over a skewed key: phase 1 aggregates
    (key, salt) — spreading a hot key over ``n_salts`` reducers —
    phase 2 combines per key. ``aggs`` maps output name →
    (phase1_expr, phase2_combiner_fn_name): e.g.
    {"total": (F.sum("v"), "sum"), "n": (F.count(F.lit(1)), "sum")}.
    """
    salted = df.withColumn("__salt", _row_salt(df, n_salts))
    phase1 = salted.groupBy(key, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (expr, _) in aggs.items()]
    )
    phase2 = phase1.groupBy(key).agg(
        *[
            getattr(F, comb)(f"__p_{name}").alias(name)
            for name, (_, comb) in aggs.items()
        ]
    )
    return phase2


def salted_join(
    skewed: DataFrame, small: DataFrame, on: str, n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed-left join by replicating the small side ``n_salts``
    times: the hot key's rows scatter across salts instead of landing
    on one reducer. Use when the small side is too big to broadcast
    but small enough to replicate n_salts×. ``how`` may be "inner" or
    "left" — left keeps unmatched skewed-side rows with nulls (each
    skewed row carries exactly one salt, so replication never
    duplicates a left match)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_l = skewed.withColumn("__salt", _row_salt(skewed, n_salts).cast("int"))
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_l.join(replicated, [on, "__salt"], how).drop("__salt")
