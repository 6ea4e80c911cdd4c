"""Per-key stateful computations (reference: state_computation,
machida/__init__.py:465-487).

Batch: applyInPandas per key — rows are replayed in event order
through the user's (data, state) function, exactly the semantics a
Wallaroo state step sees; distributed by key hash, no driver loops.

Streaming: applyInPandasWithState — the state object is pickled into
the state store between micro-batches, giving the same continuous
per-key state across triggers.
"""

from __future__ import annotations

from pyspark import cloudpickle as pickle
from types import SimpleNamespace

import pandas as pd
from pyspark.sql import DataFrame

KEY_COL = "__key"


def _sort_cols(pdf: pd.DataFrame) -> list[str]:
    cols = [c for c in ("ts", "event_id") if c in pdf.columns]
    return cols


def _records(pdf: pd.DataFrame):
    for t in pdf.itertuples(index=False):
        yield SimpleNamespace(**t._asdict())


def _apply_state_fn(fn, state_class, is_multi, pdf: pd.DataFrame, key: str, state=None):
    state = state if state is not None else state_class()
    out = []
    sort_cols = _sort_cols(pdf)
    if sort_cols:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
    for rec in _records(pdf):
        res = fn(rec, state)
        if res is None:
            continue
        rows = res if is_multi else [res]
        for r in rows:
            d = dict(r) if isinstance(r, dict) else vars(r)
            d[KEY_COL] = key
            out.append(d)
    return out, state


def run_state_batch(df: DataFrame, comp, out_schema: str) -> DataFrame:
    """groupBy(key).applyInPandas replay. ``out_schema`` must include
    ``__key string``."""

    def runner(key_tuple, pdf: pd.DataFrame):
        key = key_tuple[0]
        out, _ = _apply_state_fn(
            comp.fn, comp.state_class, comp.is_multi, pdf, key
        )
        return pd.DataFrame(out) if out else pd.DataFrame(
            {c.strip().split()[0]: pd.Series(dtype="object") for c in out_schema.split(",")}
        )

    return df.groupBy(KEY_COL).applyInPandas(runner, out_schema)


def run_state_stream(
    df: DataFrame, comp, out_schema: str, state_ttl_gap_s: int | None = None
) -> DataFrame:
    """applyInPandasWithState with pickled user state across
    micro-batches.

    Default (``state_ttl_gap_s=None``) matches the reference: a key's
    state lives until the query stops. At 100 TB with unbounded key
    cardinality that leaks; pass ``state_ttl_gap_s`` to expire a key's
    state after that much event-time inactivity (EventTimeTimeout —
    requires a watermark upstream). An expired key restarts from a
    fresh ``state_class()`` on its next event.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    state_schema = "blob binary"
    cols = [c.strip().split()[0] for c in out_schema.split(",")]

    def runner(key_tuple, pdfs, group_state):
        key = key_tuple[0]
        if group_state.hasTimedOut:
            group_state.remove()  # idle past TTL: drop the key's state
            yield pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
            return
        if group_state.exists:
            (blob,) = group_state.get
            state = pickle.loads(bytes(blob))
        else:
            state = comp.state_class()
        all_out = []
        last_ts = None
        for pdf in pdfs:
            out, state = _apply_state_fn(
                comp.fn, comp.state_class, comp.is_multi, pdf, key, state
            )
            all_out.extend(out)
            if state_ttl_gap_s is not None and "ts" in pdf.columns and len(pdf):
                m = pdf["ts"].max()
                last_ts = m if last_ts is None else max(last_ts, m)
        group_state.update((pickle.dumps(state),))
        if state_ttl_gap_s is not None and last_ts is not None:
            expiry_ms = (
                int(pd.Timestamp(last_ts).value // 1_000_000)
                + state_ttl_gap_s * 1000
            )
            group_state.setTimeoutTimestamp(expiry_ms)
        yield pd.DataFrame(all_out) if all_out else pd.DataFrame(
            {c: pd.Series(dtype="object") for c in cols}
        )

    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if state_ttl_gap_s is not None
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(KEY_COL).applyInPandasWithState(
        runner,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )
