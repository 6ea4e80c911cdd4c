"""Application runner — the engine's counterpart of machida: load a
user module exposing ``application_setup(args) -> Application`` (the
reference contract, machida/machida.pony + examples/python/*) and
execute it on Spark.

    python -m wally_spark.runner examples/word_count.py --mode batch
"""

from __future__ import annotations

import argparse
import importlib.util
import sys

from wally_spark.api import Application
from wally_spark.session import get_spark


def load_application(path: str, args: list[str]) -> Application:
    spec = importlib.util.spec_from_file_location("wally_app", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["wally_app"] = mod
    spec.loader.exec_module(mod)
    # The app module is loaded from an arbitrary path, so executors
    # can't import it by name: ship its functions/classes by value.
    # (Cluster deployments would use --py-files instead.)
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(mod)
    if not hasattr(mod, "application_setup"):
        raise SystemExit(f"{path} must define application_setup(args)")
    app = mod.application_setup(args)
    if not isinstance(app, Application):
        raise SystemExit("application_setup must return build_application(...)")
    return app


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="wally_spark.runner")
    ap.add_argument("app", help="path to the application module")
    ap.add_argument("--mode", choices=["batch", "stream"], default="batch")
    ap.add_argument("--show", type=int, default=20, help="batch: rows to print")
    ns, rest = ap.parse_known_args(argv)

    spark = get_spark("wally_spark-app")
    app = load_application(ns.app, rest)
    if ns.mode == "batch":
        df = app.run_batch(spark)
        if df is not None:
            df.show(ns.show, truncate=False)
        return 0
    q = app.run_stream(spark).start()
    q.awaitTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
