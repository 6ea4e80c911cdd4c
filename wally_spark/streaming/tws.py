"""transformWithState-backed operators (Spark 4.x arbitrary stateful
processing v2: typed state + timers).

The reference's ephemeral windows close on *inactivity* — a condition
the classic applyInPandasWithState can only approximate by waiting for
the next record. Event-time timers express it directly: when a key's
timer fires past the watermark, the engine calls back even with no new
data for that key.

NOTE: needs ``google.protobuf`` at runtime (the state-server wire
protocol). No protobuf wheel is installed in this container, but the
cloud-sdk's appengine platform bundles a pure-Python protobuf ≥6.32
runtime — ``ensure_protobuf()`` below bootstraps it when the normal
import fails, so the tests run instead of skipping.

Requires the RocksDB state store provider:
  spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
"""

from __future__ import annotations

import os
import sys

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

# A pure-Python protobuf runtime that ships inside the google-cloud-sdk
# install (read-only use; nothing outside the repo is modified).
_APPENGINE_PLATFORM = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def ensure_protobuf() -> bool:
    """Best-effort ``google.protobuf`` bootstrap.

    Spark 4.1's generated ``StateMessage_pb2`` declares gencode 6.33;
    the bundled runtime is 6.32 and protobuf's strict validator refuses
    runtime < gencode even across a one-minor gap. The wire format is
    stable across that gap, so when falling back to the bundled runtime
    the validator is relaxed — any real incompatibility would fail the
    state round-trip tests loudly, not silently. Runs at module import,
    so processors unpickled by reference repeat it inside every Python
    worker."""
    have_wheel = True
    try:
        import google.protobuf as _gpb

        # an empty PEP-420 namespace (e.g. from a JAR's google/protobuf
        # class dirs on PYTHONPATH) is NOT a usable runtime
        if getattr(_gpb, "__file__", None) is None:
            have_wheel = False
    except ImportError:
        have_wheel = False
    if not have_wheel:
        if not os.path.isdir(os.path.join(_APPENGINE_PLATFORM, "google", "protobuf")):
            return False
        if _APPENGINE_PLATFORM not in sys.path:
            sys.path.append(_APPENGINE_PLATFORM)
        for m in [n for n in list(sys.modules) if n == "google" or n.startswith("google.")]:
            del sys.modules[m]
        try:
            import google.protobuf  # noqa: F401
            from google.protobuf import runtime_version as _rv
        except ImportError:
            return False
        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        # The transformWithState streaming runner is a FRESH python
        # process that imports protobuf during ITS initialization —
        # before any user module. Put the sitecustomize shim dir on
        # PYTHONPATH so every future worker repeats this bootstrap at
        # interpreter startup. (Takes effect for JVMs launched after
        # this point; harmless when a real wheel exists.)
        shim = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pbshim")
        parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if shim not in parts:
            os.environ["PYTHONPATH"] = (
                shim + os.pathsep + os.environ["PYTHONPATH"]
                if os.environ.get("PYTHONPATH")
                else shim
            )
    return True


PROTOBUF_AVAILABLE = ensure_protobuf()


class InactivitySessionProcessor(StatefulProcessor):
    """Per-key session that closes ``gap_s`` after the last event
    (event-time): accumulates count/sum, registers a timer at
    last_ts + gap, and emits the closed session when the timer fires.
    """

    def __init__(self, gap_s: int):
        self.gap_s = gap_s

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        # microsecond-exact timestamps so gap comparisons agree with the
        # batch gaps-and-islands rule (ts.cast("double") is µs-exact)
        self.agg = handle.getValueState(
            "agg", "start_us long, last_us long, n long, total double"
        )

    def handleInputRows(self, key, rows, timerValues):
        n, total, start_us, last_us = 0, 0.0, None, None
        if self.agg.exists():
            start_us, last_us, n, total = self.agg.get()
        events: list[tuple[int, float]] = []
        for pdf in rows:
            events.extend(
                (int(pd.Timestamp(ts).value // 1_000), float(value))
                for ts, value in zip(pdf["ts"], pdf["value"])
            )
        events.sort()
        # an event past the gap CLOSES the open session and starts a new
        # one — emitted right here, without waiting for the timer (the
        # timer only closes sessions that go quiet with no successor)
        gap_us = self.gap_s * 1_000_000
        closed: list[tuple] = []
        for us, value in events:
            if last_us is not None and us - last_us > gap_us:
                closed.append(
                    (key[0], start_us // 1_000_000, n, round(total, 2))
                )
                n, total, start_us, last_us = 0, 0.0, None, None
            start_us = us if start_us is None else min(start_us, us)
            last_us = us if last_us is None else max(last_us, us)
            n += 1
            total += value
        self.agg.update((start_us, last_us, n, total))
        # re-arm the inactivity timer for the (new) open session
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        self.handle.registerTimer(last_us // 1_000 + self.gap_s * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start_s": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "total": [c[3] for c in closed],
                }
            )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if self.agg.exists():
            start_us, last_us, n, total = self.agg.get()
            self.agg.clear()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_s": [start_us // 1_000_000],
                    "n_events": [n],
                    "total": [round(total, 2)],
                }
            )

    def close(self) -> None:
        pass


def inactivity_sessions(
    df: DataFrame, gap_s: int, key_type: str = "string"
) -> DataFrame:
    """df must be keyed already (column user_id) and watermarked on ts.
    ``key_type`` is the Spark SQL type of user_id (string, bigint, …)."""
    return df.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=InactivitySessionProcessor(gap_s),
        outputStructType=(
            f"user_id {key_type}, session_start_s long, n_events long, total double"
        ),
        outputMode="Append",
        timeMode="EventTime",
    )
