"""As-of join: for each left row, the most recent right row with
right.ts <= left.ts on the same key.

Spark has no native ASOF JOIN; a naive inequality join is O(n·m) per
key. This implementation uses the union-and-carry trick: tag both
sides, sort per key by (ts, tag), and carry the latest right-side
values forward with a window function — ONE shuffle on the key, linear
work, and it scales to arbitrarily long histories (no per-key
buffering beyond the window frame).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    tolerance_s: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join. ``right_cols`` are carried onto left rows (as
    ``asof_<col>``); rows with no matching right row keep nulls. With
    ``tolerance_s``, matches farther than the tolerance are nulled.
    ``direction``: "backward" matches the most recent right row with
    right.ts <= left.ts; "forward" the earliest with right.ts >=
    left.ts (same one-shuffle carry, traversed in reverse)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    tagged_r = right.select(
        F.col(on).alias("__on"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    tagged_l = left.select(
        F.col(on).alias("__on"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        *lcols,
    ).select(*tagged_r.columns)  # align column order
    order = (
        [F.col("__ts"), F.col("__tag")]
        if direction == "backward"
        else [F.col("__ts").desc(), F.col("__tag")]
    )
    w = (
        Window.partitionBy("__on")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_r.unionByName(tagged_l)
    out_cols = [F.col(c) for c in lcols]
    match_ts = F.last(F.when(F.col("__tag") == 0, F.col("__ts")), ignorenulls=True).over(w)
    gap = (
        (F.col("__ts").cast("double") - match_ts.cast("double"))
        if direction == "backward"
        else (match_ts.cast("double") - F.col("__ts").cast("double"))
    )
    fresh = F.lit(True) if tolerance_s is None else gap <= tolerance_s
    for c in right_cols:
        carried = carried.withColumn(
            f"asof_{c}",
            F.when(
                fresh,
                F.last(
                    F.when(F.col("__tag") == 0, F.col(f"__r_{c}")), ignorenulls=True
                ).over(w),
            ),
        )
    return carried.where(F.col("__tag") == 1).select(
        *out_cols, *[F.col(f"asof_{c}") for c in right_cols]
    )
