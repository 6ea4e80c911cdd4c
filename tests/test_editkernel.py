"""operators/editkernel — the compiled banded-Levenshtein batch
kernel must be bit-identical to Spark's ``levenshtein(a, b, k)``
threshold semantics (exact distance when <= k, else -1) on arbitrary
unicode, and the dedup_edit_verified lane's two kernel arms must emit
identical rows."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from wally_spark.operators.editkernel import lev_batch_np, load_kernel

pytestmark = pytest.mark.skipif(
    load_kernel() is None, reason="no C compiler on this host"
)

SF_SMALL = "/root/testdata/sf0.001"


def _ref(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j - 1] + (a[i - 1] != b[j - 1]),
                prev[j] + 1,
                cur[j - 1] + 1,
            )
        prev = cur
    return prev[lb]


def test_kernel_matches_reference_unicode():
    rng = random.Random(7)
    alph = "abcαβγ⽇🎈 -"
    cases = [("", ""), ("abc", "abc"), ("abc", ""), ("", "xyz"),
             ("a" * 200, "a" * 200), ("a" * 200, "b" * 200)]
    for _ in range(1500):
        a = "".join(rng.choice(alph) for _ in range(rng.randint(0, 24)))
        b = "".join(rng.choice(alph) for _ in range(rng.randint(0, 24)))
        cases.append((a, b))
    for k in (0, 1, 5, 50):
        got = lev_batch_np(
            pa.array([c[0] for c in cases]),
            pa.array([c[1] for c in cases]),
            k,
        )
        for (a, b), g in zip(cases, got):
            r = _ref(a, b)
            assert g == (r if r <= k else -1), (k, a, b, int(g), r)


def test_kernel_matches_spark_levenshtein(spark):
    rng = random.Random(13)
    words = ["lorem", "ipsum", "dolor", "sit", "amet", "consectetur"]
    rows = []
    for _ in range(300):
        a = " ".join(rng.choice(words) for _ in range(rng.randint(0, 30)))
        b = " ".join(rng.choice(words) for _ in range(rng.randint(0, 30)))
        rows.append((a[:200], b[:200]))
    import pyspark.sql.functions as F

    df = spark.createDataFrame(rows, ["a", "b"])
    want = [
        r.e for r in df.select(F.levenshtein("a", "b", 50).alias("e")).collect()
    ]
    got = lev_batch_np(
        pa.array([r[0] for r in rows]), pa.array([r[1] for r in rows]), 50
    )
    assert list(got) == want


def test_edit_verified_kernel_arms_identical(spark):
    from wally_spark.plans.registry import REGISTRY

    fn = REGISTRY["dedup_edit_verified"].spark_fn
    native = sorted(map(tuple, fn(spark, SF_SMALL).collect()))
    spark.conf.set("spark.wally.edit.kernel", "jvm")
    try:
        jvm = sorted(map(tuple, fn(spark, SF_SMALL).collect()))
    finally:
        spark.conf.unset("spark.wally.edit.kernel")
    assert native == jvm and len(native) > 0
