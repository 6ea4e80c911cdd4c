"""Local mirror of the driver's correctness gate: run a registered
query on Spark and its oracle SQL on DuckDB over the same parquet
tables, then compare row count, column names, and the order-insensitive
cell values."""

from __future__ import annotations

import math

import duckdb

from wally_spark.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and float repr jitter, but KEEP the float type tag:
        # the driver hashes DuckDB HUGEINT/DECIMAL as 1149.0 while Spark
        # bigint hashes as 1149 — coercing both to "1149" here hid two
        # driver hash failures in round 1 (VERDICT.md "What's wrong" #1/#2)
        return f"f:{v + 0.0:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare(spark, name: str, sf_dir: str):
    from wally_spark.plans import REGISTRY

    qd = REGISTRY[name]
    sdf = qd.spark_fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    try:
        res = con.execute(qd.oracle)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    finally:
        con.close()

    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={scols} duck={dcols}"
    )
    # type parity: a strict driver-side schema compare must not fail on
    # int-vs-bigint drift between the engines
    duck_to_spark = {
        "BIGINT": "bigint",
        "HUGEINT": "bigint",
        "INTEGER": "int",
        "DOUBLE": "double",
        "FLOAT": "float",
        "VARCHAR": "string",
        "BOOLEAN": "boolean",
    }
    con2 = duck_connection(sf_dir)
    try:
        dtypes = {
            c: t for c, t, *_ in con2.execute(f"DESCRIBE ({qd.oracle})").fetchall()
        }
    finally:
        con2.close()
    sdtypes = dict(sdf.dtypes)
    for c, t in dtypes.items():
        # HUGEINT/DECIMAL survive fetchall() as exact Python values but the
        # driver's pandas/arrow fetch renders them as floats → silent hash
        # drift vs Spark bigint. Require explicit ::BIGINT / ::DOUBLE casts.
        assert t.upper() not in ("HUGEINT", "UHUGEINT") and not t.upper().startswith(
            "DECIMAL"
        ), f"{name}: oracle column {c} is {t}; cast it (::BIGINT/::DOUBLE) in the SQL"
        want = duck_to_spark.get(t.upper())
        if want is not None:
            assert sdtypes[c] == want, (
                f"{name}: type mismatch on {c}: duck={t} spark={sdtypes[c]}"
            )
    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duck={len(drows)}"
    )
    a, b = _norm_rows(scols, srows), _norm_rows(dcols, drows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches; first: {mismatches[0]}"
    return len(srows)
