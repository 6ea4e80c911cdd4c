"""Skew-mitigation helpers (SURVEY §6).

AQE's skew-join handling covers sort-merge joins at runtime; salting
is for the cases AQE can't split — skewed aggregation keys and
broadcast-ineligible skewed joins."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_agg(
    df: DataFrame, key: str, aggs: dict, n_salts: int = 16
) -> DataFrame:
    """Two-phase aggregation over a skewed key: phase 1 aggregates
    (key, salt) — spreading a hot key over ``n_salts`` reducers —
    phase 2 combines per key. ``aggs`` maps output name →
    (phase1_expr, phase2_combiner_fn_name): e.g.
    {"total": (F.sum("v"), "sum"), "n": (F.count(F.lit(1)), "sum")}.
    """
    # Deterministic salt: monotonically_increasing_id() is
    # nondeterministic across task retries — after a fetch failure,
    # recomputed rows could land in different salt partitions and be
    # dropped or double-counted. Hashing the full row content is stable
    # under re-execution (identical duplicate rows share a salt, which
    # only matters if a hot key's rows are also byte-identical).
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
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
    skewed: DataFrame, small: DataFrame, on: str, n_salts: int = 16
) -> DataFrame:
    """Skewed-left join by replicating the small side ``n_salts``
    times: the hot key's rows scatter across salts instead of landing
    on one reducer. Use when the small side is too big to broadcast
    but small enough to replicate n_salts×."""
    # Row-content hash, not monotonically_increasing_id(): deterministic
    # under task retry (see salted_agg).
    salted_l = skewed.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)
        ).cast("int"),
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_l.join(replicated, [on, "__salt"]).drop("__salt")
