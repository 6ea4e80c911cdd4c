"""word_count on wally_spark — the reference's canonical example
(examples/python/word_count) written against this engine's API.

Run: python -m wally_spark.runner examples/word_count.py -- \
        --docs /root/testdata/sf0.001/documents.parquet
"""

import argparse

from wally_spark import api
from wally_spark.sinks import ReturnSink
from wally_spark.sources import ParquetSourceConfig


@api.computation_multi("split into words", schema="word string")
def split_words(doc):
    return [{"word": w} for w in doc.text.lower().split(" ") if w]


class WordTotal:
    def __init__(self):
        self.count = 0


@api.state_computation("count words", WordTotal, schema="word string, count bigint")
def count_word(data, state):
    state.count += 1
    return {"word": data.word, "count": state.count}


def application_setup(args):
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default="/root/testdata/sf0.001/documents.parquet")
    ns, _ = ap.parse_known_args(args)
    pipeline = (
        api.source("word_count", ParquetSourceConfig("word_count", ns.docs))
        .to(split_words)
        .key_by("word")
        .to(count_word)
        .to_sink(ReturnSink())
    )
    return api.build_application("Word Count Application", pipeline)
