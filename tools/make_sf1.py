"""Materialize an sf~1 dataset by replicating sf0.1 tenfold (key-shifted
facts, dims copied) — the opt-in scale-record input (VERDICT r7 #8).

Usage: python tools/make_sf1.py [--src /root/testdata/sf0.1]
                                [--dst /tmp/wally_sf1] [--factor 10]
                                [--mode dupstress|natural]

Facts replicate with non-colliding key shifts (stride 10^9 per copy);
document text gets a per-copy suffix so content identities don't
collapse to 100% duplicates (dedup lanes would otherwise measure a
degenerate workload); dimension tables copy as-is, so every TPC-H join
still resolves and per-dim fanout grows with the factor, which is what
a real scale-up does. Run bench.py with --sf-dir pointing here and
--queries (spot mode) so the sf0.1 BENCH_FULL record is never touched.

Modes (VERDICT r8 #7): ``dupstress`` (default) copies embeddings
VERBATIM — a worst-case duplicate-mass probe that deliberately
concentrates LSH/band buckets (it caught the r8 pair-emission
blowup); ``natural`` adds a deterministic per-(copy, vec, dim) jitter
to every replicated embedding component (and a per-copy word swap at
a text-dependent position in each document copy), so similarity- and
dedup-family sf1 ratios measure THROUGHPUT under natural growth
instead of pathological bucket stress. Record both; read scale ratios
from natural, emission bounds from dupstress.
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


# natural-mode embedding jitter: copy 0 stays verbatim; copy i>0 adds a
# deterministic, dimension-dependent perturbation ~±0.05 (md5-derived,
# so the result is reproducible across runs and DuckDB versions —
# hash() is not version-stable, md5 is)
_NAT_EMB = (
    "SELECT vec_id + {i}::BIGINT*1000000000 AS vec_id, "
    "CASE WHEN {i} = 0 THEN embedding ELSE "
    "list_transform(list_zip(embedding, range(1, len(embedding)+1)), "
    "p -> (p[1] + ((('0x' || substr(md5(vec_id::VARCHAR || ':{i}:' || "
    "p[2]::VARCHAR), 1, 4))::INT % 1000) - 500) / 10000.0)::FLOAT) "
    "END AS embedding, label FROM t"
)
# natural-mode document copies swap ONE word (at a doc-dependent
# position) instead of appending a suffix: near-dup structure survives
# (the realistic recrawl shape) but content identity doesn't collapse
_NAT_DOC = (
    "SELECT doc_id + {i}::BIGINT*1000000000 AS doc_id, "
    "CASE WHEN {i} = 0 THEN text ELSE "
    "array_to_string(list_transform(list_zip(string_split(text, ' '), "
    "range(1, len(string_split(text, ' '))+1)), "
    "p -> CASE WHEN p[2] = 1 + (doc_id % greatest(len(string_split(text,"
    " ' ')), 1)) THEN 'nat{i}x' || p[1] ELSE p[1] END), ' ') "
    "END AS text, lang, source, n_chars FROM t"
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/wally_sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--mode", choices=("dupstress", "natural"), default="dupstress"
    )
    args = ap.parse_args()
    facts = dict(FACTS)
    if args.mode == "natural":
        facts["embeddings"] = _NAT_EMB
        facts["documents"] = _NAT_DOC
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{args.src}/{t}.parquet')) "
            f"TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, sel in facts.items():
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
