"""Capture .explain("formatted") output for named queries into
plans/r13/<name>_<tag>.txt, and optionally time each with the noop sink.

Usage:
  python tools/capture_plans.py --tag before q1_pricing_summary dedup_minhash
  python tools/capture_plans.py --tag before --top 40      # slowest 40 by BENCH_FULL
  python tools/capture_plans.py --tag after --time ...     # also min-of-N noop timing

Plans are the optimization round's evidence artifacts (guide §1.1/§7.2):
Exchange count, join strategy, PushedFilters/ReadSchema, codegen spans,
Python-eval nodes.
"""

from __future__ import annotations

import argparse
import gc
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--top", type=int, default=0, help="add the N slowest per BENCH_FULL.json")
    ap.add_argument("--time", type=int, default=0, help="min-of-N noop timing per query")
    ap.add_argument("--outdir", default=os.path.join(REPO, "plans", "r14"))
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        help="name=value spark conf(s) to set before building plans "
        "(e.g. a knob's 'before' arm)",
    )
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from wally_spark.plans import REGISTRY
    from wally_spark.session import get_spark

    names = list(args.names)
    if args.top:
        with open(os.path.join(REPO, "BENCH_FULL.json")) as f:
            rec = json.load(f)["queries"]
        for k, _ in sorted(rec.items(), key=lambda kv: -kv[1]):
            if k in REGISTRY and k not in names:
                names.append(k)
            if len(names) >= args.top:
                break

    os.makedirs(args.outdir, exist_ok=True)
    spark = get_spark("wally_spark-plancap")
    spark.sparkContext.setLogLevel("ERROR")
    for kv in args.conf:
        k, _, v = kv.partition("=")
        spark.conf.set(k, v)
    # warm the machinery like bench.py so --time numbers are comparable
    if args.time:
        for wq in ("q6_forecast_revenue", "mm_image_meta", "win_tumbling"):
            REGISTRY[wq].spark_fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    timings = {}
    for name in names:
        qd = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"plancap:{name}")
        df = qd.spark_fn(spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        line = f"{name}: plan -> {os.path.relpath(path, REPO)}"
        if args.time:
            best = best_b = best_e = None
            for _ in range(args.time):
                t0 = time.perf_counter()
                d2 = qd.spark_fn(spark, args.sf_dir)
                t1 = time.perf_counter()
                d2.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                if best is None or t2 - t0 < best:
                    best, best_b, best_e = t2 - t0, t1 - t0, t2 - t1
            timings[name] = {
                "total": round(best, 3),
                "build": round(best_b, 3),
                "exec": round(best_e, 3),
            }
            line += (
                f"  min-of-{args.time}: {best:.3f}s"
                f" (build {best_b:.3f} / exec {best_e:.3f})"
            )
            gc.collect()  # free py4j proxies so ContextCleaner can act (see bench.py)
            spark.sparkContext._jvm.System.gc()
        print(line, flush=True)
    if timings:
        print(json.dumps(timings, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
