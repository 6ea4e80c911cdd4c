"""Time-series + search walk-through on wally_spark — the r7 surface
over the `events` / `documents` / `embeddings` tables:

  1. candlesticks     events_ohlc (and its streaming twin in
                      streaming/ops.ohlc_stream)
  2. densify & fill   resample_1h → gap_fill_locf, time_weighted_avg
  3. anomalies        events_anomaly_mad, events_cusum_changepoint
  4. retrieval        bm25_rank over the document corpus
  5. lexical stats    token_pmi collocations, ngram_coverage,
                      zipf_slope per language
  6. segmentation     user_rfm_segments, basket_rules

Run: python examples/timeseries_search.py [--sf-dir /root/testdata/sf0.01]
Each step prints a small head() — the point is the composition, not
the output volume. All steps are registered queries, so the same
plans are oracle-checked by tests/test_oracle_parity.py.
"""

import argparse
import os
import sys

# runnable from anywhere: the repo root holds wally_spark/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from wally_spark.plans import REGISTRY
    from wally_spark.session import get_spark

    spark = get_spark("wally_spark-timeseries-search-example")
    spark.sparkContext.setLogLevel("ERROR")

    steps = [
        ("1. OHLC bars (type × hour)", "events_ohlc"),
        ("2a. dense hourly grid, LOCF-filled", "gap_fill_locf"),
        ("2b. LOCF time-weighted average", "time_weighted_avg"),
        ("3a. robust outliers (median/MAD)", "events_anomaly_mad"),
        ("3b. CUSUM changepoint per type", "events_cusum_changepoint"),
        ("4. BM25 top documents", "bm25_rank"),
        ("5a. PMI collocations", "token_pmi"),
        ("5b. 5-gram heavy hitters", "ngram_coverage"),
        ("5c. Zipf slope per language", "zipf_slope"),
        ("6a. RFM segment cells", "user_rfm_segments"),
        ("6b. association rules by lift", "basket_rules"),
    ]
    for title, name in steps:
        print(f"\n=== {title} [{name}] ===")
        REGISTRY[name].spark_fn(spark, args.sf_dir).show(5, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
