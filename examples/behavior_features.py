"""Customer-behavior / feature-store walk-through on wally_spark — the
round-8 behavior surface end to end over the `events` / `orders`
tables:

  1. feature export    user_churn_features (the nightly refresh; its
                       streaming twin churn_foreach_batch keeps the
                       same table always-fresh from a profile corpus)
  2. value segments    user_rfm_segments, revenue_decile_gains
  3. lifecycle         cohort_revenue_ltv, user_survival_curve,
                       user_purchase_intervals
  4. journey           attribution_last_touch, session_conversion_lag,
                       events_markov_stationary
  5. baselines/alerts  events_ewma (streaming twin: ewma_stream),
                       events_benford

Run: python examples/behavior_features.py [--sf-dir /root/testdata/sf0.01]
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

    spark = get_spark("wally_spark-behavior-example")
    spark.sparkContext.setLogLevel("ERROR")

    steps = [
        ("churn feature export", "user_churn_features"),
        ("RFM quartile segments", "user_rfm_segments"),
        ("revenue decile gains", "revenue_decile_gains"),
        ("cohort LTV curve", "cohort_revenue_ltv"),
        ("lifetime survival", "user_survival_curve"),
        ("repeat-purchase cadence", "user_purchase_intervals"),
        ("last-touch attribution", "attribution_last_touch"),
        ("session time-to-convert", "session_conversion_lag"),
        ("long-run behavior mix", "events_markov_stationary"),
        ("spend-spike baseline", "events_ewma"),
        ("first-digit DQ audit", "events_benford"),
    ]
    for label, name in steps:
        df = REGISTRY[name].spark_fn(spark, args.sf_dir)
        print(f"\n=== {label} ({name}) ===")
        df.show(5, truncate=80)

    spark.stop()


if __name__ == "__main__":
    main()
