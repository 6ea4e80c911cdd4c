"""transformWithState-backed operators (Spark 4.x arbitrary stateful
processing v2: typed state + timers).

The reference's ephemeral windows close on *inactivity* — a condition
the classic applyInPandasWithState can only approximate by waiting for
the next record. Event-time timers express it directly: when a key's
timer fires past the watermark, the engine calls back even with no new
data for that key.

NOTE: needs ``google.protobuf`` at runtime (the state-server wire
protocol); absent in this container, so the test is gated — the
operator is the designated round-2 path once the dependency exists.

Requires the RocksDB state store provider:
  spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class InactivitySessionProcessor(StatefulProcessor):
    """Per-key session that closes ``gap_s`` after the last event
    (event-time): accumulates count/sum, registers a timer at
    last_ts + gap, and emits the closed session when the timer fires.
    """

    def __init__(self, gap_s: int):
        self.gap_s = gap_s

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.agg = handle.getValueState(
            "agg", "start_s long, last_s long, n long, total double"
        )

    def handleInputRows(self, key, rows, timer_values):
        n, total, start_s, last_s = 0, 0.0, None, None
        if self.agg.exists():
            start_s, last_s, n, total = self.agg.get()
        for pdf in rows:
            for ts, value in zip(pdf["ts"], pdf["value"]):
                s = int(pd.Timestamp(ts).value // 1_000_000_000)
                start_s = s if start_s is None else min(start_s, s)
                last_s = s if last_s is None else max(last_s, s)
                n += 1
                total += float(value)
        self.agg.update((start_s, last_s, n, total))
        # re-arm the inactivity timer for this key
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        self.handle.registerTimer((last_s + self.gap_s) * 1000)
        return iter(())

    def handleExpiredTimer(self, key, timer_values, expired_timer_info):
        if self.agg.exists():
            start_s, last_s, n, total = self.agg.get()
            self.agg.clear()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_s": [start_s],
                    "n_events": [n],
                    "total": [round(total, 2)],
                }
            )

    def close(self) -> None:
        pass


def inactivity_sessions(df: DataFrame, gap_s: int) -> DataFrame:
    """df must be keyed already (column user_id) and watermarked on ts."""
    return df.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=InactivitySessionProcessor(gap_s),
        outputStructType="user_id string, session_start_s long, n_events long, total double",
        outputMode="Append",
        timeMode="EventTime",
    )
