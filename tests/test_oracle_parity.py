"""Every registered query with an oracle must match DuckDB exactly at
sf0.01 — mirrors the driver's CORRECTNESS gate. Rows-only queries (no
oracle) must at least run and return a stable schema."""

from __future__ import annotations

import pytest

from tests.conftest import SF_MED
from tests.oracle import compare


def _names():
    from wally_spark.plans import REGISTRY

    return sorted(REGISTRY)


@pytest.mark.parametrize("name", _names())
def test_query_parity(spark, name):
    from wally_spark.plans import REGISTRY

    qd = REGISTRY[name]
    if qd.oracle is None:
        df = qd.spark_fn(spark, SF_MED)
        assert df.columns
        assert df.count() >= 0
    else:
        compare(spark, name, SF_MED)
