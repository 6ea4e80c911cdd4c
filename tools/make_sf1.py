"""Materialize an sf~1 dataset by replicating sf0.1 tenfold (key-shifted
facts, dims copied) — the opt-in scale-record input (VERDICT r7 #8).

Usage: python tools/make_sf1.py [--src /root/testdata/sf0.1]
                                [--dst /tmp/wally_sf1] [--factor 10]

Facts replicate with non-colliding key shifts (stride 10^9 per copy);
document text gets a per-copy suffix so content identities don't
collapse to 100% duplicates (dedup lanes would otherwise measure a
degenerate workload); dimension tables copy as-is, so every TPC-H join
still resolves and per-dim fanout grows with the factor, which is what
a real scale-up does. Run bench.py with --sf-dir pointing here and
--queries (spot mode) so the sf0.1 BENCH_FULL record is never touched.
"""

from __future__ import annotations

import argparse
import os

import duckdb

FACTS = {
    "events": "SELECT event_id + {i}::BIGINT*1000000000 AS event_id, ts, user_id, "
    "event_type, value, props FROM t",
    "documents": "SELECT doc_id + {i}::BIGINT*1000000000 AS doc_id, "
    "CASE WHEN {i} = 0 THEN text ELSE text || ' v{i}' END AS text, "
    "lang, source, n_chars FROM t",
    "embeddings": "SELECT vec_id + {i}::BIGINT*1000000000 AS vec_id, embedding, "
    "label FROM t",
    "orders": "SELECT o_orderkey + {i}::BIGINT*1000000000 AS o_orderkey, o_custkey, "
    "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM t",
    "lineitem": "SELECT l_orderkey + {i}::BIGINT*1000000000 AS l_orderkey, l_partkey, "
    "l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, "
    "l_tax, l_returnflag, l_linestatus, l_shipdate FROM t",
}
DIMS = ("region", "nation", "customer", "supplier", "part")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/wally_sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{args.src}/{t}.parquet')) "
            f"TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, sel in FACTS.items():
        con.execute(
            f"CREATE OR REPLACE VIEW t AS "
            f"SELECT * FROM read_parquet('{args.src}/{t}.parquet')"
        )
        union = " UNION ALL ".join(
            sel.replace("{i}", str(i)) for i in range(args.factor)
        )
        con.execute(
            f"COPY ({union}) TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{args.dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
