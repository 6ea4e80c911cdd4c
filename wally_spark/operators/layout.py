"""Z-order (Morton-curve) data layout for multi-dimensional file
skipping — the write-side half of predicate pushdown at 100 TB.

A parquet scan prunes row groups whose [min, max] column statistics
exclude the predicate. Range-partitioning on ONE column gives perfect
pruning on that column and none on any other; interleaving the bits of
several columns' rank keys clusters rows so that EVERY interleaved
column has tight per-file min/max ranges, and a selective filter on any
of them skips most files. This is the standard Morton/Z-curve layout
(public literature: Morton 1966; used by every lakehouse table format).

Everything is codegen column arithmetic — no UDFs, no driver data:
per-column bounds come from one tiny agg broadcast back, the key is
fixed-point bit interleaving, and the write is
repartitionByRange(zkey).sortWithinPartitions(zkey) so file boundaries
follow the curve.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

BITS = 16  # per-dimension fixed-point resolution


def _norm_expr(col: str, lo: str, hi: str, bits: int):
    """Rank col into [0, 2^bits) by min/max fixed-point scaling.
    Degenerate (constant) columns map to 0."""
    span = F.col(hi) - F.col(lo)
    scaled = F.when(span == 0, F.lit(0)).otherwise(
        F.floor(
            (F.col(col).cast("double") - F.col(lo))
            / (span + F.lit(1e-12))
            * F.lit(float(2**bits))
        )
    )
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(2**bits - 1)).cast("bigint")


def zorder_key(normed: list, bits: int = BITS):
    """Morton-interleave the bit patterns of pre-normalized bigint
    columns (each in [0, 2^bits)): output bit (i*ndim + d) is input d's
    bit i. Pure shift/and/or codegen expression tree."""
    ndim = len(normed)
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        for d, c in enumerate(normed):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * ndim + d))
    return out


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 16,
    bits: int = BITS,
) -> None:
    """Write ``df`` to parquet clustered along the Z-curve of ``cols``.

    One bounds agg (2×len(cols) numbers, broadcast), one range
    shuffle — the same cost as any repartitionByRange write. At 100 TB
    ``n_files`` becomes files-per-partition under a date/bucket
    partitioning scheme; the curve math is unchanged."""
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{c}") for c in cols],
    )
    keyed = df.join(F.broadcast(bounds))
    normed = [_norm_expr(c, f"__lo_{c}", f"__hi_{c}", bits) for c in cols]
    keyed = keyed.withColumn("__z", zorder_key(normed, bits)).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
