"""Print the _DRIVER_GREEN set for the next round.

Reads every CORRECTNESS_r*.json in the repo root, takes the UNION of
queries whose LATEST driver row is fully green (rows+schema+hash, no
err), and prints a ready-to-paste frozenset literal for
wally_spark/plans/__init__.py. Queries in _NO_ORACLE are excluded
(they can never go green). Run at the START of a round, after the
driver wrote the previous round's CORRECTNESS file; then empty
_CHANGED_THIS_ROUND and re-add names as modules change in-round.

Usage: python tools/promote_greens.py
"""

from __future__ import annotations

import glob
import json
import os
import re


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            if name not in latest or rnd >= latest[name][0]:
                latest[name] = (rnd, green)
    import sys

    sys.path.insert(0, root)
    from wally_spark.plans import REGISTRY, _NO_ORACLE

    greens = sorted(
        n
        for n, (_, g) in latest.items()
        if g and n in REGISTRY and n not in _NO_ORACLE
    )
    stale = sorted(n for n in REGISTRY if n not in {g for g in greens} and n not in _NO_ORACLE)
    print(f"# {len(greens)} driver-green (latest row), {len(stale)} needing a check")
    print("_DRIVER_GREEN = frozenset(")
    print("    {")
    line = "        "
    for n in greens:
        item = f'"{n}", '
        if len(line) + len(item) > 78:
            print(line.rstrip())
            line = "        "
        line += item
    if line.strip():
        print(line.rstrip())
    print("    }")
    print(")")


if __name__ == "__main__":
    main()
