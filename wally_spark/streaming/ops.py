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


def inactivity_sessions_classic(df: DataFrame, gap_s: int) -> DataFrame:
    """Inactivity-closed sessions on the classic state API: per-key
    accumulator + EventTimeTimeout. When a key is quiet past the
    watermark, Spark invokes the function with timed_out=True and the
    session is emitted — same semantics the reference's ephemeral
    windows implement (ephemeral_window.pony), no new-API deps.

    Expects columns (ts timestamp, user_id, value) and a watermark on
    ts; emits (user_id, session_start_s, n_events, total).
    """
    import pandas as pd

    from pyspark import cloudpickle
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id string, session_start_s long, n_events long, total double"

    def runner(key, pdfs, state):
        user = key[0]
        if state.hasTimedOut:
            if state.exists:
                (blob,) = state.get
                start_s, last_s, n, total = cloudpickle.loads(bytes(blob))
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user],
                        "session_start_s": [start_s],
                        "n_events": [n],
                        "total": [round(total, 2)],
                    }
                )
            return
        if state.exists:
            (blob,) = state.get
            start_s, last_s, n, total = cloudpickle.loads(bytes(blob))
        else:
            start_s, last_s, n, total = None, None, 0, 0.0
        for pdf in pdfs:
            for ts, value in zip(pdf["ts"], pdf["value"]):
                s = int(pd.Timestamp(ts).value // 1_000_000_000)
                start_s = s if start_s is None else min(start_s, s)
                last_s = s if last_s is None else max(last_s, s)
                n += 1
                total += float(value)
        state.update((cloudpickle.dumps((start_s, last_s, n, total)),))
        # close the session once the watermark passes last event + gap
        state.setTimeoutTimestamp((last_s + gap_s) * 1000)
        yield pd.DataFrame(
            {c.split()[0].strip(): pd.Series(dtype="object") for c in out_schema.split(",")}
        )

    return df.groupBy("user_id").applyInPandasWithState(
        runner,
        outputStructType=out_schema,
        stateStructType="blob binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
