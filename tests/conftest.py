from __future__ import annotations

import os

import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from wally_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    # Python workers must import test modules (classes referenced from
    # cloudpickled closures are pickled by reference when module-level).
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    extra = f"{repo}:{os.path.join(repo, 'tests')}"
    prev = os.environ.get("PYTHONPATH")
    os.environ["PYTHONPATH"] = f"{extra}:{prev}" if prev else extra
    s = get_spark("wally_spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def spark_global(spark):
    """Alias usable inside hypothesis @given tests (function-scoped
    fixtures can't be combined with @given)."""
    return spark
