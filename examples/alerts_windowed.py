"""alerts_windowed on wally_spark — sliding-window transaction totals
with threshold alerts (reference: examples/python/alerts_windowed).

Run: python -m wally_spark.runner examples/alerts_windowed.py
"""

import argparse

import pyspark.sql.functions as F

from wally_spark import api
from wally_spark.sinks import ReturnSink
from wally_spark.sources import ParquetSourceConfig


class TotalAggregation(api.Aggregation):
    output_schema = "total double"

    def initial_accumulator(self):
        return {"total": 0.0}

    def update(self, transaction, acc):
        acc["total"] += transaction.value

    def combine(self, a, b):
        return {"total": a["total"] + b["total"]}

    def output(self, user, acc):
        if acc["total"] > 250:
            return {"total": round(acc["total"], 2)}
        return None  # below threshold: no alert fires

    def spark_agg(self):
        return None  # exercise the python Aggregation path


def application_setup(args):
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", default="/root/testdata/sf0.001/events.parquet")
    ns, _ = ap.parse_known_args(args)
    pipeline = (
        api.source("Alerts (windowed)", ParquetSourceConfig("ev", ns.events))
        .key_by("user_id")
        .to(
            api.range_windows(api.hours(1))
            .with_slide(api.minutes(20))
            .over(TotalAggregation)
        )
        .to_sink(ReturnSink())
    )
    return api.build_application("Alerts (windowed)", pipeline)
