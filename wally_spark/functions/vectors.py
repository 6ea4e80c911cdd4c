"""Vector math over array<float|double> columns as built-in-function
expressions. For bulk all-pairs work prefer the blocked-BLAS
mapInPandas path (plans/dedup.py) — per-element HOF lambdas are
interpreted, fine for per-row use, slow for 10^7-pair joins."""

from __future__ import annotations

import pyspark.sql.functions as F


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a, b):
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
