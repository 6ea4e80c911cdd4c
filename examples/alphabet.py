"""alphabet on wally_spark — keyed running vote totals (reference:
examples/python/alphabet/alphabet.py: add_votes state_computation
keyed by letter).

Run: python -m wally_spark.runner examples/alphabet.py
"""

import argparse

from wally_spark import api
from wally_spark.sinks import ReturnSink
from wally_spark.sources import ParquetSourceConfig


class TotalVotes:
    def __init__(self):
        self.count = 0


@api.state_computation(
    "add votes", TotalVotes, schema="letter string, votes bigint"
)
def add_votes(event, state):
    state.count += 1
    return {"letter": event.event_type, "votes": state.count}


def application_setup(args):
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", default="/root/testdata/sf0.001/events.parquet")
    ns, _ = ap.parse_known_args(args)
    pipeline = (
        api.source("alphabet", ParquetSourceConfig("ev", ns.events))
        .key_by("event_type")
        .to(add_votes)
        .to_sink(ReturnSink())
    )
    return api.build_application("Alphabet", pipeline)
