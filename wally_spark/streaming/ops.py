"""Streaming-specific operators beyond the pipeline API."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def dedup_stream(df: DataFrame, keys: list[str], ts: str, watermark: str) -> DataFrame:
    """Exactly-once-per-key delivery within the watermark horizon —
    the streaming analog of dedup_exact. State is bounded by the
    watermark (old keys age out), so memory is O(keys inside horizon),
    which is what makes it viable on an unbounded 100 TB stream."""
    return df.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on,
    left_ts: str,
    right_ts: str,
    watermark: str,
    condition=None,
    how: str = "inner",
) -> DataFrame:
    """Windowed stream-stream join (market_spread's two live streams):
    both sides watermarked so Spark can discard state outside the
    join horizon."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = on if condition is None else (on & condition)
    return lw.join(rw, cond, how)
