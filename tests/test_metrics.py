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
        # per-source detail present on every batch metric
        assert all(m.sources for m in mine)
    finally:
        spark.streams.removeListener(listener)


def test_metrics_per_operator(spark, tmp_path):
    """A stateful (windowed-agg) query surfaces per-operator state
    metrics — the reference monitoring hub's per-step view."""
    import pyspark.sql.functions as F

    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        path = _write_batches(
            spark,
            str(tmp_path),
            [
                [(BASE + "01", "a", 1), (BASE + "02", "b", 2)],
                [(BASE + "03", "a", 3)],
            ],
        )
        name = f"t_{uuid.uuid4().hex[:8]}"
        agg = (
            _stream_df(spark, path)
            .withWatermark("ts", "1 minute")
            .groupBy(F.window("ts", "1 minute"), "user_id")
            .agg(F.sum("value").alias("total"))
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        deadline = time.time() + 20
        while time.time() < deadline:
            if listener.per_operator():
                break
            time.sleep(0.3)
        ops = listener.per_operator()
        assert ops, "no state operator metrics recorded"
        (op_name, agg_m) = next(iter(ops.items()))
        assert op_name, "state operator must report a name"
        assert agg_m["rows_total"] >= 2  # a and b window-state rows live
        assert agg_m["rows_updated"] >= 2  # a and b state rows touched
    finally:
        spark.streams.removeListener(listener)


def test_metrics_hub_http():
    """MetricsHub serves the listener's rollups over HTTP — the
    engine-side counterpart of the reference monitoring hub
    (monitoring_hub/apps/metrics_reporter). Pure driver-local: no
    stream needed, fabricated batch history exercises every route."""
    import urllib.request

    from wally_spark.streaming.hub import MetricsHub
    from wally_spark.streaming.metrics import BatchMetric

    listener = MetricsListener()
    listener.history.extend(
        [
            BatchMetric(
                query_name="celsius", batch_id=i, num_input_rows=100 + i,
                input_rows_per_second=50.0, process_rows_per_second=60.0,
                batch_duration_ms=200, watermark=None,
                state_operators=[{
                    "operator": "stateStoreSave", "rows_total": 10 + i,
                    "rows_updated": 5, "rows_removed": 0,
                    "memory_bytes": 4096,
                }],
                sources=[{"description": "FileSource", "rows": 100 + i,
                          "rows_per_sec": 50.0}],
            )
            for i in range(3)
        ]
    )

    def get(hub, route):
        with urllib.request.urlopen(hub.url + route, timeout=10) as r:
            assert r.headers["Content-Type"] == "application/json"
            return json.loads(r.read())

    with MetricsHub(listener) as hub:
        index = get(hub, "/")
        assert index["queries"] == ["celsius"]
        assert index["totals"]["rows"] == 303
        totals = get(hub, "/totals")
        assert totals == listener.totals()
        assert totals["batches"] == 3 and totals["wall_ms"] == 600
        ops = get(hub, "/operators")
        assert ops["stateStoreSave"]["rows_updated"] == 15
        assert ops["stateStoreSave"]["rows_total"] == 12  # last batch
        hist = get(hub, "/history?limit=2")
        assert [m["batch_id"] for m in hist] == [1, 2]
        # unknown route -> JSON 404, server stays up
        import urllib.error
        try:
            get(hub, "/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
        assert get(hub, "/totals")["batches"] == 3
        # /ui serves the self-contained dashboard page (html, inline
        # script polling the JSON routes — no external assets)
        with urllib.request.urlopen(hub.url + "/ui", timeout=10) as r:
            assert r.headers["Content-Type"].startswith("text/html")
            page = r.read().decode()
        assert "wally_spark metrics hub" in page
        for route in ("/totals", "/operators", "/history"):
            assert route in page
        assert "http" not in page.lower().replace("http.server", ""), (
            "ui page must not fetch external assets"
        )
