"""Null/degenerate-row robustness sweep: the registry must survive a
corpus containing NULL text, empty strings, whitespace-only docs, and
NULL event values/props.

At 100 TB these rows exist — extraction failures, encoding bugs,
upstream schema drift. An operator that dies on ONE null row kills the
whole partition's task (and with it the job); dropping or bucketing
the row is fine, crashing is not. Complements test_empty_corpus.py
(zero rows) with the other operational reality (bad rows).
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL

from wally_spark.tables import TABLES, load_tables


@pytest.fixture(scope="session")
def dirty_sf(spark, tmp_path_factory):
    """sf0.001 mirror with pathological rows injected into documents
    (NULL / empty / whitespace / single-word text) and events (NULL
    value, NULL props). Injected ids sit above the real id range so
    joins stay consistent."""
    root = tmp_path_factory.mktemp("dirty_sf")
    src = load_tables(spark, SF_SMALL)
    for t in TABLES:
        df = src[t]
        if t == "documents":
            top = df.agg(F.max("doc_id")).collect()[0][0] or 0
            bad = spark.createDataFrame(
                [
                    (top + 1, None, "en", "web", 0),
                    (top + 2, "", "en", "web", 0),
                    (top + 3, "   ", None, "web", 3),
                    (top + 4, "word", "en", None, 4),
                ],
                "doc_id long, text string, lang string, source string, n_chars int",
            )
            df = df.unionByName(
                bad.select(*[F.col(c).cast(dict(df.dtypes)[c]) for c in df.columns])
            )
        elif t == "events":
            top = df.agg(F.max("event_id")).collect()[0][0] or 0
            first = df.limit(1).collect()[0]
            bad = spark.createDataFrame(
                [
                    (top + 1, first["ts"], first["user_id"], "view", None, None),
                    (top + 2, first["ts"], first["user_id"], None, 1.0, None),
                ],
                df.schema,
            )
            df = df.unionByName(bad)
        df.write.mode("overwrite").parquet(str(root / f"{t}.parquet"))
    return str(root)


def test_every_query_survives_dirty_corpus(spark, dirty_sf):
    import wally_spark.plans as plans

    failures = []
    for name, qd in plans.REGISTRY.items():
        try:
            qd.spark_fn(spark, dirty_sf).count()
        except Exception as e:  # noqa: BLE001 — collecting a report
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "queries crashed on dirty corpus:\n" + "\n".join(
        failures[:20]
    ) + (f"\n... and {len(failures) - 20} more" if len(failures) > 20 else "")


def test_substring_dedup_finds_planted_passage(spark, tmp_path):
    """Semantic gate beyond the oracle: plant one 14-word passage
    verbatim inside two otherwise-unrelated documents — dedup_substring
    must report a duplicated span covering >= the passage length in
    both docs, and docs without shared passages must report zero."""
    import pyspark.sql.functions as F

    passage = ("alpha beta gamma delta epsilon zeta eta theta iota "
               "kappa lam mu nu xi")
    filler_a = " ".join(f"worda{i}" for i in range(30))
    filler_b = " ".join(f"wordb{i}" for i in range(30))
    clean = " ".join(f"wordc{i}" for i in range(40))
    rows = [
        (1, f"{filler_a} {passage} {filler_a}", "en", "s0", 1),
        (2, f"{filler_b} {passage}", "en", "s0", 1),
        (3, clean, "en", "s0", 1),
    ]
    out = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{out}/documents.parquet")
    # satisfy load_tables' lazy reader for the one table used
    from wally_spark.plans.curation import dedup_substring

    got = {r["doc_id"]: r for r in dedup_substring(spark, out).collect()}
    assert got[3]["n_spans"] == 0 and got[3]["dup_tokens"] == 0
    for d in (1, 2):
        assert got[d]["n_spans"] >= 1, got[d]
        assert got[d]["dup_tokens"] >= 14, got[d]


def test_decode_audit_routes_bad_rows(spark, tmp_path):
    """events_decode_audit must separate unparseable JSON, a missing /
    non-integer key, and out-of-range values — planted rows exercise
    every verdict branch (the sf tables are all-clean, so the oracle
    run only sees 'ok')."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "click", 1.0, '{"k": 5}'),
        (2, dt.datetime(2024, 1, 1, 0, 1, 0), 1, "click", 1.0, "{not json"),
        (3, dt.datetime(2024, 1, 1, 0, 2, 0), 1, "click", 1.0, None),
        (4, dt.datetime(2024, 1, 1, 0, 3, 0), 1, "click", 1.0, '{"j": 5}'),
        (5, dt.datetime(2024, 1, 1, 0, 4, 0), 1, "click", 1.0, '{"k": "x"}'),
        (6, dt.datetime(2024, 1, 1, 0, 5, 0), 1, "click", 1.0, '{"k": 250}'),
    ]
    out = str(tmp_path / "ev")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{out}/events.parquet")
    from wally_spark.plans.sequence import events_decode_audit

    got = {
        r["verdict"]: (r["n"], r["first_event_id"])
        for r in events_decode_audit(spark, out).collect()
    }
    assert got["ok"] == (1, 1)
    assert got["malformed"] == (2, 2)  # bad JSON + NULL props
    assert got["missing_k"] == (2, 4)  # absent key + non-integer value
    assert got["out_of_range"] == (1, 6)
