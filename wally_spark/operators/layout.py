"""Z-order (Morton-curve) data layout for multi-dimensional file
skipping — the write-side half of predicate pushdown at 100 TB.

A parquet scan prunes row groups whose [min, max] column statistics
exclude the predicate. Range-partitioning on ONE column gives perfect
pruning on that column and none on any other; interleaving the bits of
several columns' rank keys clusters rows so that EVERY interleaved
column has tight per-file min/max ranges, and a selective filter on any
of them skips most files. This is the standard Morton/Z-curve layout
(public literature: Morton 1966; used by every lakehouse table format).

Ranking is EQUI-DEPTH, not min/max scaling: each dimension is bucketed
against its approx-quantile cut points, so the rank is uniform in data
MASS no matter how skewed the raw values are. Min/max fixed-point
scaling collapses a skewed column into a few low-rank cells, which
drags every file boundary into the dense region and destroys pruning
on that column — the classic 100 TB failure mode (real columns are
always skewed).

Everything is codegen column arithmetic — no UDFs, no driver data:
per-column cut points come from one tiny percentile_approx agg
broadcast back, the rank is a codegen fold over that array, the key is
bit interleaving, and files are split on the GRID-ALIGNED curve cell id
(top bits of the z-key) so every output file covers one aligned Morton
cell with tight per-dimension bounds.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

BITS = 8  # per-dimension rank resolution: 2^BITS equi-depth buckets


def _rank_expr(col: str, bounds_col: str):
    """Equi-depth rank of ``col``: the count of quantile cut points
    <= value, folded over the broadcast bounds array (pure codegen,
    O(2^bits) comparisons per row). NULLs and degenerate (constant)
    columns rank 0 / constant — both harmless to the curve."""
    return F.coalesce(
        F.aggregate(
            F.col(bounds_col),
            F.lit(0).cast("bigint"),
            lambda acc, b: acc
            + F.when(F.col(col).cast("double") >= b, 1)
            .otherwise(0)
            .cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
    )


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

    One cut-point agg (len(cols) small arrays, broadcast), one range
    shuffle — the same cost as any repartitionByRange write. Files are
    assigned by the aligned curve cell ``floor(z * n_files / 2^zbits)``
    rather than raw z mass-quantiles, so file boundaries never straddle
    Morton cells; equi-depth ranks make the cells (hence the files)
    mass-balanced. At 100 TB ``n_files`` becomes files-per-partition
    under a date/bucket partitioning scheme; the curve math is
    unchanged."""
    ndim = len(cols)
    q = 2**bits
    probs = F.array(*[F.lit(i / q) for i in range(1, q)])
    bounds = df.agg(
        *[
            F.percentile_approx(F.col(c).cast("double"), probs, 10000).alias(
                f"__qb_{c}"
            )
            for c in cols
        ]
    )
    keyed = df.join(F.broadcast(bounds))
    normed = [_rank_expr(c, f"__qb_{c}") for c in cols]
    keyed = (
        keyed.withColumn("__z", zorder_key(normed, bits))
        .withColumn(
            "__zcell",
            F.floor(F.col("__z") * F.lit(n_files) / F.lit(float(2 ** (ndim * bits)))),
        )
        .drop(*[f"__qb_{c}" for c in cols])
    )
    # range-partition on the CELL id alone: equal keys always land in
    # one partition, so no file ever straddles a Morton cell (adding
    # __z as a tiebreak would let the sampler split mid-cell and bleed
    # a neighboring cell's range into the file's column stats)
    (
        keyed.repartitionByRange(n_files, "__zcell")
        .sortWithinPartitions("__z")
        .drop("__z", "__zcell")
        .write.mode("overwrite")
        .parquet(path)
    )
