from __future__ import annotations

import json
import time
import uuid

from tests.test_api_stream import BASE, _stream_df, _write_batches
from wally_spark.streaming.metrics import MetricsListener


def test_metrics_listener(spark, tmp_path):
    listener = MetricsListener(jsonl_path=f"{tmp_path}/metrics.jsonl")
    spark.streams.addListener(listener)
    try:
        path = _write_batches(
            spark,
            str(tmp_path),
            [
                [(BASE + "01", "a", 1), (BASE + "02", "b", 2)],
                [(BASE + "03", "c", 3)],
            ],
        )
        name = f"t_{uuid.uuid4().hex[:8]}"
        q = (
            _stream_df(spark, path)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener callbacks are async: wait for them to land
        deadline = time.time() + 20
        while time.time() < deadline:
            mine = [m for m in listener.history if m.query_name == name]
            if sum(m.num_input_rows for m in mine) >= 3:
                break
            time.sleep(0.3)
        mine = [m for m in listener.history if m.query_name == name]
        assert sum(m.num_input_rows for m in mine) == 3
        assert len(mine) >= 2  # at least the two data batches
        with open(f"{tmp_path}/metrics.jsonl") as f:
            lines = [json.loads(l) for l in f]
        assert any(l["query_name"] == name for l in lines)
        assert listener.totals()["rows"] >= 3
    finally:
        spark.streams.removeListener(listener)
