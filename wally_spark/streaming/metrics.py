"""Streaming metrics — the engine's counterpart of the reference's
monitoring hub (reference: monitoring_hub/, giles senders report
throughput/latency per pipeline step).

Spark already computes per-batch rates; this listener surfaces them as
a queryable history and an optional JSONL sink, so an operator watches
throughput the way wallaroo's metrics UI did."""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetric:
    query_name: str
    batch_id: int
    num_input_rows: int
    input_rows_per_second: float
    process_rows_per_second: float
    batch_duration_ms: int
    watermark: str | None


@dataclass
class MetricsListener(StreamingQueryListener):
    """Attach with ``spark.streams.addListener(listener)``; every
    finished micro-batch appends a BatchMetric (and a JSON line when
    ``jsonl_path`` is set)."""

    jsonl_path: str | None = None
    history: list[BatchMetric] = field(default_factory=list)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        m = BatchMetric(
            query_name=p.name or str(p.id),
            batch_id=p.batchId,
            num_input_rows=p.numInputRows,
            input_rows_per_second=p.inputRowsPerSecond or 0.0,
            process_rows_per_second=p.processedRowsPerSecond or 0.0,
            batch_duration_ms=p.batchDuration,
            watermark=(p.eventTime or {}).get("watermark"),
        )
        with self._lock:
            self.history.append(m)
            if self.jsonl_path:
                with open(self.jsonl_path, "a") as f:
                    f.write(json.dumps(vars(m)) + "\n")

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    def totals(self) -> dict:
        with self._lock:
            rows = sum(m.num_input_rows for m in self.history)
            ms = sum(m.batch_duration_ms for m in self.history)
        return {
            "batches": len(self.history),
            "rows": rows,
            "wall_ms": ms,
            "rows_per_sec": rows / (ms / 1000.0) if ms else 0.0,
        }
