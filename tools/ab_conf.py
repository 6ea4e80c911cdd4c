"""Same-session A/B of a boolean spark conf across named queries.

Usage:
  python tools/ab_conf.py --conf spark.wally.pin.eager --reps 3 lane1 lane2 ...

For each lane, runs `reps` noop-sink executions with the conf at
"true" and at "false" (interleaved A,B,A,B,... so session aging hits
both arms equally) and reports per-arm minimums.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--conf", required=True)
    ap.add_argument(
        "--values",
        default="true,false",
        help="comma-separated pair of conf values for the two arms",
    )
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from wally_spark.plans import REGISTRY
    from wally_spark.session import get_spark

    spark = get_spark("wally_spark-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for wq in ("q6_forecast_revenue", "mm_image_meta", "win_tumbling"):
        REGISTRY[wq].spark_fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    arms = tuple(args.values.split(","))
    assert len(arms) == 2, "--values needs exactly two comma-separated values"
    out = {}
    for name in args.names:
        qd = REGISTRY[name]
        best = {arms[0]: None, arms[1]: None}
        for _ in range(args.reps):
            for arm in arms:
                spark.conf.set(args.conf, arm)
                t0 = time.perf_counter()
                qd.spark_fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if best[arm] is None or dt < best[arm]:
                    best[arm] = dt
                gc.collect()  # free py4j proxies so ContextCleaner can act (see bench.py)
                spark.sparkContext._jvm.System.gc()
        out[name] = {k: round(v, 3) for k, v in best.items()}
        print(
            f"{name}: {args.conf}={arms[0]} {best[arms[0]]:.3f}s"
            f"  ={arms[1]} {best[arms[1]]:.3f}s",
            flush=True,
        )
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
