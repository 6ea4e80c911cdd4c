"""Monitoring on wally_spark — watch a streaming pipeline's throughput
the way the reference's monitoring hub does (reference:
monitoring_hub/, giles senders reporting per-step metrics).

Attach a MetricsListener to capture per-batch metrics, serve them over
HTTP with MetricsHub, and poll from any dashboard or curl:

    curl http://127.0.0.1:<port>/totals
    curl http://127.0.0.1:<port>/operators
    curl http://127.0.0.1:<port>/history?limit=10

Run (from the repo root): PYTHONPATH=. python examples/monitoring.py
"""

import json
import time
import urllib.request

import pyspark.sql.functions as F

from wally_spark.session import get_spark
from wally_spark.streaming.hub import MetricsHub
from wally_spark.streaming.metrics import MetricsListener


def main():
    spark = get_spark("monitoring-example")
    listener = MetricsListener()
    spark.streams.addListener(listener)
    hub = MetricsHub(listener).start()
    print(f"metrics hub serving at {hub.url}")

    # any streaming pipeline works; a rate source keeps this self-contained
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .load()
        .withWatermark("timestamp", "1 second")
        .groupBy(F.window("timestamp", "1 second"))
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("rate_counts")
        .outputMode("update")
        .start()
    )
    try:
        for _ in range(5):
            time.sleep(2)
            with urllib.request.urlopen(hub.url + "/totals", timeout=5) as r:
                print("totals:", json.loads(r.read()))
        with urllib.request.urlopen(hub.url + "/operators", timeout=5) as r:
            print("operators:", json.loads(r.read()))
    finally:
        q.stop()
        hub.stop()
        spark.streams.removeListener(listener)


if __name__ == "__main__":
    main()
