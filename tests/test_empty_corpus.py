"""Empty-input robustness sweep: every registered query must survive
zero-row tables.

At 100 TB, zero rows mid-pipeline is routine — a partition-pruned date
range, a language filter on a corpus slice, an empty Kafka window. An
operator that crashes on an empty input (collect()[0], percentile of
nothing, k-means init sampling an empty relation) is an operational
bug even when every SF test passes. This sweep runs the WHOLE registry
against a zero-row mirror of the test tables and asserts each query
plans and executes (the row count itself is unconstrained — empty in,
empty-or-summary out, both are legitimate).

Default-on but budget-aware: the full registry sweep runs in one test
chunked across queries so a failure names the query without paying 119
Spark session fixtures.
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMALL

from wally_spark.tables import TABLES, load_tables


@pytest.fixture(scope="session")
def empty_sf(spark, tmp_path_factory):
    """Zero-row parquet mirror of the sf0.001 tables (same schemas)."""
    root = tmp_path_factory.mktemp("empty_sf")
    src = load_tables(spark, SF_SMALL)
    for t in TABLES:
        src[t].limit(0).write.mode("overwrite").parquet(str(root / f"{t}.parquet"))
    return str(root)


def test_every_query_survives_empty_corpus(spark, empty_sf):
    import wally_spark.plans as plans

    failures = []
    for name, qd in plans.REGISTRY.items():
        try:
            df = qd.spark_fn(spark, empty_sf)
            df.count()
        except Exception as e:  # noqa: BLE001 — collecting a report
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "queries crashed on empty input:\n" + "\n".join(
        failures[:20]
    ) + (f"\n... and {len(failures) - 20} more" if len(failures) > 20 else "")
