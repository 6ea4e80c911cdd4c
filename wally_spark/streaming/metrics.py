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
    # per-stage detail (reference: metrics UI reports per pipeline
    # STEP, not just per pipeline): one dict per stateful operator /
    # per source in the micro-batch
    state_operators: list = field(default_factory=list)
    sources: list = field(default_factory=list)


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
            state_operators=[
                {
                    "operator": so.operatorName,
                    "rows_total": so.numRowsTotal,
                    "rows_updated": so.numRowsUpdated,
                    "rows_removed": so.numRowsRemoved,
                    "memory_bytes": so.memoryUsedBytes,
                }
                for so in (p.stateOperators or [])
            ],
            sources=[
                {
                    "description": s.description,
                    "rows": s.numInputRows,
                    "rows_per_sec": s.processedRowsPerSecond or 0.0,
                }
                for s in (p.sources or [])
            ],
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

    def per_operator(self) -> dict:
        """Stateful-operator rollup across the recorded batches:
        {operator name: {batches, rows_updated (sum), rows_total /
        memory_bytes (last batch)}} — the per-step view the reference's
        monitoring hub renders per pipeline stage."""
        out: dict[str, dict] = {}
        with self._lock:
            for m in self.history:
                for so in m.state_operators:
                    agg = out.setdefault(
                        so["operator"],
                        {"batches": 0, "rows_updated": 0,
                         "rows_total": 0, "memory_bytes": 0},
                    )
                    agg["batches"] += 1
                    agg["rows_updated"] += so["rows_updated"]
                    agg["rows_total"] = so["rows_total"]
                    agg["memory_bytes"] = so["memory_bytes"]
        return out
